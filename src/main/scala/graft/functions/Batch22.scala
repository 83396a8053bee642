package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 batch 22: introspection/context kernels and small utilities.
  *
  *  - byteSize (reference src/Functions/byteSize.cpp: fixed-width types
  *    report their width, String reports length + 9 — the serialized
  *    var-length prefix)
  *  - isNullable / isConstant / defaultValueOfArgumentType
  *    (src/Functions/isNullable.cpp, isConstant.cpp,
  *    defaultValueOfArgumentType.cpp)
  *  - isIPAddressInRange (src/Functions/isIPAddressContainedIn.cpp:
  *    CIDR prefix compare per family; a v4 address never matches a v6
  *    range and vice versa)
  *  - parseTimeDelta (src/Functions/parseTimeDelta.cpp: alternating
  *    number+unit tokens, separators ignored, months = 30.5 days,
  *    years = 365 days)
  *  - isDecimalOverflow (src/Functions/isDecimalOverflow.cpp: do the
  *    value's significant digits exceed the given precision)
  *  - sipHash64Keyed/sipHash128Keyed/sipHash128ReferenceKeyed
  *    (src/Functions/FunctionsHashing.h keyed variants over the
  *    HashCompat SipHash cores)
  */
object Batch22 {

  private val timeUnits: Map[String, Double] = Map(
    "years" -> 365.0 * 24 * 3600, "year" -> 365.0 * 24 * 3600,
    "yr" -> 365.0 * 24 * 3600, "y" -> 365.0 * 24 * 3600,
    "months" -> 30.5 * 24 * 3600, "month" -> 30.5 * 24 * 3600,
    "mo" -> 30.5 * 24 * 3600,
    "weeks" -> 7.0 * 24 * 3600, "week" -> 7.0 * 24 * 3600,
    "w" -> 7.0 * 24 * 3600,
    "days" -> 24.0 * 3600, "day" -> 24.0 * 3600, "d" -> 24.0 * 3600,
    "hours" -> 3600.0, "hour" -> 3600.0, "hr" -> 3600.0, "h" -> 3600.0,
    "minutes" -> 60.0, "minute" -> 60.0, "min" -> 60.0, "m" -> 60.0,
    "seconds" -> 1.0, "second" -> 1.0, "sec" -> 1.0, "s" -> 1.0,
    "milliseconds" -> 1e-3, "millisecond" -> 1e-3, "millisec" -> 1e-3,
    "ms" -> 1e-3,
    "microseconds" -> 1e-6, "microsecond" -> 1e-6, "microsec" -> 1e-6,
    "μs" -> 1e-6, "µs" -> 1e-6, "us" -> 1e-6,
    "nanoseconds" -> 1e-9, "nanosecond" -> 1e-9, "nanosec" -> 1e-9,
    "ns" -> 1e-9)

  private val deltaToken =
    "([0-9]+(?:\\.[0-9]+)?)\\s*([A-Za-zμµ]+)".r

  def parseTimeDelta(s: String): Double = {
    var total = 0.0
    var matched = false
    for (m <- deltaToken.findAllMatchIn(s)) {
      val unit = m.group(2).toLowerCase
      val factor = timeUnits.getOrElse(unit,
        throw new IllegalArgumentException(s"parseTimeDelta: unknown unit '$unit'"))
      total += m.group(1).toDouble * factor
      matched = true
    }
    if (!matched)
      throw new IllegalArgumentException(s"parseTimeDelta: cannot parse '$s'")
    total
  }

  /** CIDR containment; address and range must be the same family. */
  def ipInRange(ip: String, cidr: String): Boolean = {
    val slash = cidr.lastIndexOf('/')
    val (net, prefix) =
      if (slash < 0) (cidr, -1)
      else (cidr.substring(0, slash), cidr.substring(slash + 1).toInt)
    val ipB = parseIp(ip)
    val netB = parseIp(net)
    if (ipB == null || netB == null || ipB.length != netB.length) return false
    val p = if (prefix < 0) netB.length * 8 else prefix
    if (p > netB.length * 8) return false
    var bit = 0
    while (bit < p) {
      val byteIdx = bit / 8
      val mask = 0x80 >> (bit % 8)
      if ((ipB(byteIdx) & mask) != (netB(byteIdx) & mask)) return false
      bit += 1
    }
    true
  }

  /** Literal-only IP parse (no DNS): dotted v4 or RFC 4291 v6. */
  private[functions] def parseIp(s: String): Array[Byte] = {
    val t = s.trim
    if (t.isEmpty) return null
    val isV4 = t.matches("([0-9]{1,3}\\.){3}[0-9]{1,3}")
    val isV6 = t.contains(":") && t.matches("[0-9A-Fa-f:.]+")
    if (!isV4 && !isV6) return null
    try java.net.InetAddress.getByName(t).getAddress
    catch { case _: Exception => null }
  }
}

/** In-memory byte width per reference byteSize.cpp. */
case class ByteSizeExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    child.dataType match {
      case ByteType | BooleanType => 1L
      case ShortType => 2L
      case IntegerType | FloatType | DateType => 4L
      case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
      case _: DecimalType => 8L
      case StringType =>
        if (v == null) 9L else v.asInstanceOf[UTF8String].numBytes + 9L
      case BinaryType =>
        if (v == null) 9L else v.asInstanceOf[Array[Byte]].length + 9L
      case other => throw new IllegalArgumentException(s"byteSize: unsupported $other")
    }
  }
  override protected def withNewChildInternal(c: Expression): ByteSizeExpr = copy(child = c)
}

case class IsNullableExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = child.nullable
  override protected def withNewChildInternal(c: Expression): IsNullableExpr = copy(child = c)
}

case class IsConstantExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = child.foldable
  override protected def withNewChildInternal(c: Expression): IsConstantExpr = copy(child = c)
}

case class DefaultValueOfArgExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any =
    if (child.nullable) null
    else child.dataType match {
      case ByteType => 0.toByte
      case ShortType => 0.toShort
      case IntegerType | DateType => 0
      case LongType | TimestampType | TimestampNTZType => 0L
      case FloatType => 0.0f
      case DoubleType => 0.0
      case d: DecimalType => Decimal(0, d.precision, d.scale)
      case BooleanType => false
      case StringType => UTF8String.fromString("")
      case other => throw new IllegalArgumentException(
        s"defaultValueOfArgumentType: no default for $other")
    }
  override protected def withNewChildInternal(c: Expression): DefaultValueOfArgExpr =
    copy(child = c)
}

case class IsIpInRange(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(ip: Any, cidr: Any): Any =
    Batch22.ipInRange(ip.toString, cidr.toString)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IsIpInRange =
    copy(left = l, right = r)
}

case class ParseTimeDeltaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = Batch22.parseTimeDelta(v.toString)
  override protected def withNewChildInternal(c: Expression): ParseTimeDeltaExpr =
    copy(child = c)
}

/** isDecimalOverflow(d[, prec]): significant digits of the unscaled
  * value exceed prec; the 1-arg form checks against the argument's own
  * declared precision (reference isDecimalOverflow.cpp). */
case class IsDecimalOverflowExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val unscaled = vs(0) match {
      case dec: Decimal => dec.toJavaBigDecimal.unscaledValue.abs
      case n: Number => java.math.BigInteger.valueOf(math.abs(n.longValue))
    }
    val prec =
      if (vs.length >= 2) vs(1).asInstanceOf[Number].intValue
      else children.head.dataType match {
        case d: DecimalType => d.precision
        case _ => 38
      }
    unscaled.toString.length > prec
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): IsDecimalOverflowExpr =
    copy(children = c)
}

/** sipHash64Keyed((k0, k1), data) family over the HashCompat cores.
  * variant: 64 -> Long; 128 / 128ref -> 16-byte Binary (same convention
  * as ChHash128, hex() renders it like the reference's FixedString). */
case class ChSipKeyed(children: Seq[Expression], variant: String)
    extends Expression with CodegenFallback {
  override def dataType: DataType = if (variant == "64") LongType else BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val k0 = vs(0).asInstanceOf[Number].longValue
    val k1 = vs(1).asInstanceOf[Number].longValue
    val data = HashInput.bytes(vs(2), children(2).dataType)
    variant match {
      case "64" => HashCompat.sipHash64Keyed(k0, k1, data)
      case "128" => HashCompat.sipHash128Keyed(k0, k1, data)
      case "128ref" => HashCompat.sipHash128ReferenceKeyed(k0, k1, data)
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ChSipKeyed =
    copy(children = c)
}
