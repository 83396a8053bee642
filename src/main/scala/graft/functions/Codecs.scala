package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Address / geo codecs (reference: src/Functions/FunctionsCodingIP.cpp
  * IPv6NumToString/IPv6StringToNum, src/Functions/geohashEncode.cpp,
  * geohashDecode.cpp). Deterministic scalar kernels — no engine state, so
  * they parallelize as ordinary projections.
  */
object Codecs {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  // ---------------------------------------------------------------- IPv6

  /** RFC 5952 canonical text form of a 16-byte IPv6 address: lowercase
    * hex, longest (leftmost on tie, length ≥ 2) zero run compressed to
    * "::", IPv4-mapped rendered in dotted-quad form. */
  private[functions] def canonicalIpv6(bytes: Array[Byte]): String = {
    // IPv4-mapped ::ffff:a.b.c.d
    val v4mapped = bytes.take(10).forall(_ == 0) &&
      (bytes(10) & 0xff) == 0xff && (bytes(11) & 0xff) == 0xff
    if (v4mapped)
      return s"::ffff:${bytes(12) & 0xff}.${bytes(13) & 0xff}.${bytes(14) & 0xff}.${bytes(15) & 0xff}"
    val groups = Array.tabulate(8)(i => ((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff))
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (groups(i) == 0) {
        var j = i
        while (j < 8 && groups(j) == 0) j += 1
        if (j - i > bestLen) { bestLen = j - i; bestStart = i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) bestStart = -1
    val sb = new StringBuilder
    var k = 0
    while (k < 8) {
      if (k == bestStart) { sb.append("::"); k += bestLen }
      else {
        if (sb.nonEmpty && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(Integer.toHexString(groups(k)))
        k += 1
      }
    }
    if (sb.isEmpty) "::" else sb.toString
  }

  /** Parse an IPv6 (or IPv4 — mapped to ::ffff:...) literal to 16 bytes;
    * null on malformed input. Guarded by a charset check so
    * InetAddress.getByName can never fall through to a DNS lookup. */
  private[functions] def parseIpv6(s: String): Array[Byte] = {
    if (s == null || s.isEmpty || !s.forall(c =>
        c == ':' || c == '.' || (c >= '0' && c <= '9') ||
        (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))) return null
    try {
      val addr = java.net.InetAddress.getByName(s).getAddress
      if (addr.length == 16) addr
      else { // IPv4 -> IPv4-mapped IPv6 (reference FunctionsCodingIP.cpp)
        val out = new Array[Byte](16)
        out(10) = 0xff.toByte; out(11) = 0xff.toByte
        System.arraycopy(addr, 0, out, 12, 4)
        out
      }
    } catch { case _: Exception => null }
  }

  case class Ipv6StringToNum(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      parseIpv6(input.asInstanceOf[UTF8String].toString)
    override protected def withNewChildInternal(c: Expression): Ipv6StringToNum = copy(child = c)
  }

  case class Ipv6NumToString(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      if (b.length != 16) null else UTF8String.fromString(canonicalIpv6(b))
    }
    override protected def withNewChildInternal(c: Expression): Ipv6NumToString = copy(child = c)
  }

  // ------------------------------------------------------------- geohash

  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash: interleave longitude/latitude bisection bits
    * (longitude first), 5 bits per base32 character. */
  private[functions] def geohashEncode(lon: Double, lat: Double, precision: Int): String = {
    val p = math.max(1, math.min(12, precision))
    var lo = -180.0; var hi = 180.0; var la = -90.0; var lb = 90.0
    val sb = new StringBuilder(p)
    var evenBit = true; var bits = 0; var ch = 0
    while (sb.length < p) {
      if (evenBit) {
        val mid = (lo + hi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lo = mid } else { ch = ch << 1; hi = mid }
      } else {
        val mid = (la + lb) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; la = mid } else { ch = ch << 1; lb = mid }
      }
      evenBit = !evenBit
      bits += 1
      if (bits == 5) { sb.append(base32.charAt(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  /** Decode a geohash to its cell-center (lon, lat). */
  private[functions] def geohashDecode(gh: String): Option[(Double, Double)] = {
    var lo = -180.0; var hi = 180.0; var la = -90.0; var lb = 90.0
    var evenBit = true
    var i = 0
    while (i < gh.length) {
      val cd = base32.indexOf(gh.charAt(i).toLower)
      if (cd < 0) return None
      var b = 4
      while (b >= 0) {
        val bit = (cd >> b) & 1
        if (evenBit) { val mid = (lo + hi) / 2; if (bit == 1) lo = mid else hi = mid }
        else { val mid = (la + lb) / 2; if (bit == 1) la = mid else lb = mid }
        evenBit = !evenBit
        b -= 1
      }
      i += 1
    }
    Some(((lo + hi) / 2, (la + lb) / 2))
  }

  case class GeohashEncode(left: Expression, right: Expression, precision: Int)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    // inputs arrive as whatever numeric type the parser chose (decimal
    // literals are DecimalType) — normalize here instead of relying on
    // analyzer casts, which need sql-private AbstractDataType to declare
    private def toD(v: Any): Double = v match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case other => throw new IllegalArgumentException(s"not numeric: $other")
    }
    override def nullSafeEval(lon: Any, lat: Any): Any =
      UTF8String.fromString(geohashEncode(toD(lon), toD(lat), precision))
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  case class GeohashDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      geohashDecode(input.asInstanceOf[UTF8String].toString) match {
        case Some((lon, lat)) => new GenericArrayData(Array(lon, lat))
        case None => null
      }
    override protected def withNewChildInternal(c: Expression): GeohashDecode = copy(child = c)
  }

  def ipv6_string_to_num(s: Column): Column = column(Ipv6StringToNum(expression(s)))
  def ipv6_num_to_string(b: Column): Column = column(Ipv6NumToString(expression(b)))
  def geohash_encode(lon: Column, lat: Column, precision: Int): Column =
    column(GeohashEncode(expression(lon), expression(lat), precision))
  def geohash_decode(gh: Column): Column = column(GeohashDecode(expression(gh)))
}
