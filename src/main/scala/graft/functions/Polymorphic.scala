package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Coalesce, ElementAt, Expression, Length, Literal, Size}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.types.{ArrayType, MapType}

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
