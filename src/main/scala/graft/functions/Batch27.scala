package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 batch 27: gamma functions, charset conversion, IPv6 CIDR.
  *
  *  - lgamma/tgamma (reference src/Functions/FunctionMathUnary.h over
  *    libm): Lanczos g=7/n=9 approximation with the standard published
  *    coefficients, reflection for x < 0.5; accurate to ~1e-13 relative
  *    (documented — libm itself differs across platforms at this level)
  *  - convertCharset (src/Functions/convertCharset.cpp over ICU): the
  *    JDK charset machinery plays ICU's role; unmappable bytes use the
  *    charset's standard replacement, unknown charsets throw
  *  - IPv6CIDRToRange (src/Functions/FunctionsCodingIP.cpp): prefix
  *    mask over the 16-byte address, canonical RFC 5952 rendering of
  *    (lower, upper)
  */
object Batch27 {

  // Lanczos coefficients (g = 7, n = 9) — the standard published set
  private val lanczosG = 7.0
  private val lanczosC = Array(
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7)

  /** log |Gamma(x)| via Lanczos; NaN for non-positive integers. */
  def lgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x < 0.5) {
      // reflection: Gamma(x) Gamma(1-x) = pi / sin(pi x)
      val s = math.sin(math.Pi * x)
      if (s == 0.0) return Double.PositiveInfinity // pole
      return math.log(math.Pi / math.abs(s)) - lgamma(1.0 - x)
    }
    val z = x - 1.0
    var acc = lanczosC(0)
    var i = 1
    while (i < lanczosC.length) { acc += lanczosC(i) / (z + i); i += 1 }
    val t = z + lanczosG + 0.5
    0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(acc)
  }

  def tgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x < 0.5) {
      val s = math.sin(math.Pi * x)
      if (s == 0.0) return Double.NaN // pole at non-positive integers
      return math.Pi / (s * tgamma(1.0 - x))
    }
    val z = x - 1.0
    var acc = lanczosC(0)
    var i = 1
    while (i < lanczosC.length) { acc += lanczosC(i) / (z + i); i += 1 }
    val t = z + lanczosG + 0.5
    math.sqrt(2 * math.Pi) * math.pow(t, z + 0.5) * math.exp(-t) * acc
  }

  def convertCharset(s: UTF8String, from: String, to: String): Array[Byte] = {
    val cFrom = java.nio.charset.Charset.forName(from)
    val cTo = java.nio.charset.Charset.forName(to)
    new String(s.getBytes, cFrom).getBytes(cTo)
  }

  def ipv6CidrToRange(ip: String, prefix: Int): Option[(String, String)] = {
    val b = Codecs.parseIpv6(ip)
    if (b == null || prefix < 0 || prefix > 128) return None
    val lo = b.clone()
    val hi = b.clone()
    var bit = prefix
    while (bit < 128) {
      val idx = bit / 8
      val mask = (0x80 >> (bit % 8)).toByte
      lo(idx) = (lo(idx) & ~mask).toByte
      hi(idx) = (hi(idx) | mask).toByte
      bit += 1
    }
    Some((Codecs.canonicalIpv6(lo), Codecs.canonicalIpv6(hi)))
  }
}

case class GammaExpr(child: Expression, logForm: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Number].doubleValue
    if (logForm) Batch27.lgamma(x) else Batch27.tgamma(x)
  }
  override protected def withNewChildInternal(c: Expression): GammaExpr = copy(child = c)
}

case class ConvertCharsetExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    UTF8String.fromBytes(Batch27.convertCharset(
      vs(0).asInstanceOf[UTF8String], vs(1).toString, vs(2).toString))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ConvertCharsetExpr =
    copy(children = c)
}

case class Ipv6CidrToRangeExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("col1", StringType), StructField("col2", StringType)))
  override def nullable: Boolean = true
  override def nullSafeEval(ip: Any, p: Any): Any =
    Batch27.ipv6CidrToRange(ip.toString, p.asInstanceOf[Number].intValue) match {
      case Some((lo, hi)) =>
        InternalRow.fromSeq(Seq(UTF8String.fromString(lo), UTF8String.fromString(hi)))
      case None => null
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Ipv6CidrToRangeExpr =
    copy(left = l, right = r)
}
