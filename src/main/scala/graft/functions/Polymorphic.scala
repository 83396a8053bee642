package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, ElementAt, EqualTo, Expression, If, IsNull, Length, Literal, OctetLength, Or, Reverse, Size, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, MapType, NullType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polymorphic length (reference src/Functions/array/length.cpp +
  * src/Functions/lengthUTF8.cpp registration: ClickHouse `length` accepts
  * String OR Array/Map). Spark splits this into `length` (string) and
  * `size` (collections); this RuntimeReplaceable dispatches on the
  * resolved child type so dialect queries can stay polymorphic. Found by
  * the dialect fuzzer (FuzzDialect): `length(splitByChar(...))` used to
  * fail analysis after translating to Spark's string-only `length`.
  * On String the reference counts BYTES (only lengthUTF8 counts code
  * points), so the string branch is OctetLength, not Length. */
case class ChLength(child: Expression) extends RuntimeReplaceable
    with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    case StringType => OctetLength(child)
    case _ => Length(child)
  }
  override protected def withNewChildInternal(newChild: Expression): ChLength =
    copy(child = newChild)
}

/** Reverse a string as a SEQUENCE OF BYTES — the reference `reverse`
  * contract for String (src/Functions/reverse.cpp: ReverseImpl copies
  * bytes back-to-front; only reverseUTF8 reverses code points). A
  * mid-string multi-byte char therefore comes back as reversed raw
  * bytes, exactly like the reference. */
case class ChByteReverse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    ChBytes.reverseEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ChBytes.reverseEval($a);")
  override protected def withNewChildInternal(c: Expression): ChByteReverse = copy(c)
}

object ChBytes {
  def reverseEval(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(b.length - 1 - i); i += 1 }
    UTF8String.fromBytes(out)
  }
}

/** Polymorphic reverse (reference src/Functions/reverse.cpp:52 accepts
  * String, FixedString, Array or Tuple): arrays go to Spark's Reverse,
  * strings to the byte-reversing kernel above. */
case class ChReverse(child: Expression) extends RuntimeReplaceable
    with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType => Reverse(child)
    case StringType => ChByteReverse(child)
    case _ => ChByteReverse(Cast(child, StringType))
  }
  override protected def withNewChildInternal(newChild: Expression): ChReverse =
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
  private def withDefault(vt: DataType, keyType: DataType,
                          zeroIsDefault: Boolean): Expression = {
    // Spark's ElementAt demands the EXACT map key type (and INT array
    // ordinals) inside a RuntimeReplaceable — no implicit coercion runs
    // on the replacement tree — while CH CONVERTS the lookup key to the
    // container's key type (arrayElement.cpp matchKeyToIndexNumber). A
    // numeric key that doesn't round-trip through the key type cannot
    // match any entry (and can't legally index), so it yields the
    // default rather than a wrapped/truncated false hit.
    val (key, fits): (Expression, Expression) =
      if (right.dataType == keyType) (right, Literal(true))
      else if (right.dataType.isInstanceOf[NumericType] &&
          keyType.isInstanceOf[NumericType])
        (Cast(right, keyType),
          EqualTo(Cast(Cast(right, keyType), right.dataType), right))
      // non-numeric mismatch (e.g. String-keyed map with an Int lookup):
      // CH rejects it (NO_COMMON_TYPE) — leave the raw key so analysis
      // fails, as the reference's own must-fail tests expect
      else (right, Literal(true))
    val hit = Coalesce(Seq(
      ElementAt(left, key, None, failOnError = false), Literal.default(vt)))
    val guarded = if (fits == Literal(true)) hit
      else If(fits, hit, Literal.default(vt))
    // Spark's ElementAt throws on ordinal 0 even with failOnError=false;
    // CH returns the default for a (non-constant) 0 index — guard it.
    val body =
      if (zeroIsDefault)
        If(EqualTo(Cast(right, LongType), Literal(0L)), Literal.default(vt), guarded)
      else guarded
    If(Or(IsNull(left), IsNull(right)), Literal(null, vt), body)
  }
  override lazy val replacement: Expression = left.dataType match {
    // a NULL-typed index can't resolve inside ElementAt — short-circuit
    case ArrayType(et, _) if right.dataType == NullType => Literal(null, et)
    case MapType(_, vt, _) if right.dataType == NullType => Literal(null, vt)
    case ArrayType(et, _) => withDefault(et, IntegerType, zeroIsDefault = true)
    case MapType(kt, vt, _) => withDefault(vt, kt, zeroIsDefault = false)
    case _ => ElementAt(left, right, None, failOnError = false)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChElementAt =
    copy(left = newLeft, right = newRight)
}

/** CH toTypeName (reference src/Functions/toTypeName.cpp): renders the
  * ARGUMENT's type in ClickHouse spelling, resolved at analysis time.
  * Spark's type lattice is narrower (no unsigned widths), so the closest
  * CH name of the Spark type is reported — Int64 for BIGINT etc. */
case class ChTypeNameOf(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true

  private def chName(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "String"
    case BooleanType => "Bool"
    case DateType => "Date"
    case _: TimestampType | TimestampNTZType => "DateTime"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case BinaryType => "String"
    case NullType => "Nothing"
    case a: ArrayType => s"Array(${wrapped(a.elementType, a.containsNull)})"
    case m: MapType => s"Map(${chName(m.keyType)}, ${wrapped(m.valueType, m.valueContainsNull)})"
    case s: StructType =>
      s"Tuple(${s.fields.map(f => wrapped(f.dataType, f.nullable)).mkString(", ")})"
    case other => other.simpleString
  }
  // CH columns are non-Nullable unless declared; Spark's nullability flag
  // is true for almost everything, so wrapping on it would mislabel plain
  // columns — report the bare name (tests asserting Nullable(...) diffs
  // stay out of the anchor set)
  private def wrapped(dt: DataType, nullable: Boolean): String = chName(dt)

  private lazy val rendered: Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(chName(child.dataType))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = rendered
  override def nullSafeEval(v: Any): Any = rendered
  override protected def withNewChildInternal(c: Expression): ChTypeNameOf =
    copy(child = c)
}

/** CH toDate over ANY input type (reference FunctionsConversion.h):
  * integrals are DAYS SINCE EPOCH (the Date domain is day numbers),
  * strings parse (date-only or full datetime, date part taken),
  * timestamps truncate, dates pass through. Round 11 — unlocks the
  * reference's toDate(number) test idiom. */
case class ChToDate(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.util.DateTimeUtils

  override def dataType: DataType = DateType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  private lazy val utc = java.time.ZoneId.of("UTC")

  /** Reference ToDateTransform32Or64 (FunctionsConversion.h): values in
    * [0, 65535] are day numbers; larger values are unix-timestamp seconds
    * (converted to days); negatives saturate to day 0. */
  private def numToDays(l: Long): Int =
    if (l < 0L) 0
    else if (l <= 65535L) l.toInt
    else math.floorDiv(l, 86400L).toInt

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      numToDays(v.asInstanceOf[Number].longValue)
    case FloatType | DoubleType =>
      numToDays(v.asInstanceOf[Number].doubleValue.toLong)
    case _: DecimalType =>
      numToDays(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toLong)
    case DateType => v
    case _: TimestampType | TimestampNTZType =>
      DateTimeUtils.microsToDays(v.asInstanceOf[Long], utc)
    case _ =>
      val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      DateTimeUtils.stringToDate(s)
        .orElse(DateTimeUtils.stringToTimestamp(s, utc)
          .map(us => DateTimeUtils.microsToDays(us, utc)))
        .orNull
  }
  override protected def withNewChildInternal(c: Expression): ChToDate =
    copy(child = c)
}
