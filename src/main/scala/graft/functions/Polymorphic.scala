package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, ElementAt, EqualTo, Expression, If, IsNull, Length, Literal, Or, Size}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, NullType}

/** Polymorphic length (reference src/Functions/array/length.cpp +
  * src/Functions/lengthUTF8.cpp registration: ClickHouse `length` accepts
  * String OR Array/Map). Spark splits this into `length` (string) and
  * `size` (collections); this RuntimeReplaceable dispatches on the
  * resolved child type so dialect queries can stay polymorphic. Found by
  * the dialect fuzzer (FuzzDialect): `length(splitByChar(...))` used to
  * fail analysis after translating to Spark's string-only `length`. */
case class ChLength(child: Expression) extends RuntimeReplaceable
    with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    case _ => Length(child)
  }
  override protected def withNewChildInternal(newChild: Expression): ChLength =
    copy(child = newChild)
}

/** First/last element of an array with the ELEMENT-TYPE DEFAULT (0, '',
  * [], false…) when the array is empty or NULL — the reference
  * `arrayFirst`/`arrayLast` contract
  * (src/Functions/array/arrayFirstLast.cpp:187,195 use
  * ElementNotExistsStrategy::Default via insertDefault; only the
  * `OrNull` variants return NULL). Catalyst's `Literal.default` yields
  * the same per-type defaults. The dialect template passes the
  * already-filtered array. */
case class ChFirstLastDefault(child: Expression, last: Boolean)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case ArrayType(et, _) =>
      Coalesce(Seq(
        ElementAt(child, Literal(if (last) -1 else 1), None, failOnError = false),
        Literal.default(et)))
    case _ => child
  }
  override protected def withNewChildInternal(
      newChild: Expression): ChFirstLastDefault =
    copy(child = newChild)
}

/** CH element access: `arr[i]` out of bounds and `map[key]` missing key
  * return the ELEMENT-TYPE DEFAULT (reference
  * src/Functions/array/arrayElement.cpp:39 `Zero` mode: "Fill with zero
  * or default if array index out of range or map key not found"); only
  * `arrayElementOrNull` returns NULL. A NULL container or NULL index
  * still yields NULL (ordinary NULL propagation). */
case class ChElementAt(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  private def withDefault(vt: DataType, zeroIsDefault: Boolean): Expression = {
    // Spark's ElementAt throws on ordinal 0 even with failOnError=false;
    // CH returns the default for a (non-constant) 0 index — guard it.
    val hit = Coalesce(Seq(
      ElementAt(left, right, None, failOnError = false), Literal.default(vt)))
    val body =
      if (zeroIsDefault)
        If(EqualTo(Cast(right, LongType), Literal(0L)), Literal.default(vt), hit)
      else hit
    If(Or(IsNull(left), IsNull(right)), Literal(null, vt), body)
  }
  override lazy val replacement: Expression = left.dataType match {
    // a NULL-typed index can't resolve inside ElementAt — short-circuit
    case ArrayType(et, _) if right.dataType == NullType => Literal(null, et)
    case MapType(_, vt, _) if right.dataType == NullType => Literal(null, vt)
    case ArrayType(et, _) => withDefault(et, zeroIsDefault = true)
    case MapType(_, vt, _) => withDefault(vt, zeroIsDefault = false)
    case _ => ElementAt(left, right, None, failOnError = false)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChElementAt =
    copy(left = newLeft, right = newRight)
}
