package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** reinterpretAs* family (reference src/Functions/reinterpretAs.cpp):
  * bit-level reinterpretation of a value's little-endian bytes.
  *
  *  - string -> numeric: copy min(width, len) bytes LE, zero-padded
  *    (reinterpretAs.cpp:183);
  *  - numeric -> numeric: copy min(from, to) LE bytes (line 254);
  *  - numeric -> string: the LE bytes with trailing zero bytes cut
  *    (executeToString, line 337-349);
  *  - reinterpretAsDate: UInt16 epoch days; reinterpretAsDateTime:
  *    UInt32 epoch seconds.
  *
  * Int128/256 and UUID targets are out of scope (no Spark type carries
  * 128-bit integers losslessly) — documented gap. */
object Reinterpret {
  /** LE bytes of a value according to its source type width. */
  def leBytes(input: Any): Array[Byte] = input match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
    case b: Byte => Array(b)
    case sh: Short => Array((sh & 0xff).toByte, ((sh >> 8) & 0xff).toByte)
    case i: Int =>
      Array.tabulate(4)(j => ((i >> (8 * j)) & 0xff).toByte)
    case l: Long =>
      Array.tabulate(8)(j => ((l >> (8 * j)) & 0xff).toByte)
    case f: Float =>
      val i = java.lang.Float.floatToRawIntBits(f)
      Array.tabulate(4)(j => ((i >> (8 * j)) & 0xff).toByte)
    case d: Double =>
      val l = java.lang.Double.doubleToRawLongBits(d)
      Array.tabulate(8)(j => ((l >> (8 * j)) & 0xff).toByte)
    case b: Boolean => Array(if (b) 1.toByte else 0.toByte)
  }

  /** First min(width, len) LE bytes as a long; sign- or zero-extended. */
  def toIntBits(b: Array[Byte], width: Int, signed: Boolean): Long = {
    var v = 0L
    val n = Math.min(width, b.length)
    var i = 0
    while (i < n) { v |= (b(i) & 0xffL) << (8 * i); i += 1 }
    if (signed && width < 8) {
      val shift = 64 - 8 * width
      (v << shift) >> shift
    } else v
  }

  def toStringTrim(b: Array[Byte]): UTF8String = {
    var n = b.length
    while (n > 0 && b(n - 1) == 0) n -= 1
    UTF8String.fromBytes(java.util.Arrays.copyOf(b, n))
  }
}

/** target: u8/u16/u32/u64/i8/i16/i32/i64/f32/f64/date/datetime/string */
case class ChReinterpret(child: Expression, target: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = target match {
    case "i8" => ByteType
    case "i16" => ShortType
    case "i32" => IntegerType
    case "i64" | "u32" | "u64" => LongType
    case "u8" | "u16" => IntegerType
    case "f32" => FloatType
    case "f64" => DoubleType
    case "date" => DateType
    case "datetime" => TimestampType
    case "string" => StringType
    // round-10 tail: 128/256-bit targets land on DECIMAL(38,0) (the
    // engine's declared wide-integer carrier); uuid renders canonical
    case "u128" | "i128" | "u256" | "i256" => DecimalType(38, 0)
    case "uuid" => StringType
    case "fixedstring" => StringType
  }
  override def nullSafeEval(input: Any): Any = {
    val b = Reinterpret.leBytes(input)
    target match {
      case "u8" => Reinterpret.toIntBits(b, 1, signed = false).toInt
      case "u16" => Reinterpret.toIntBits(b, 2, signed = false).toInt
      case "u32" => Reinterpret.toIntBits(b, 4, signed = false)
      case "u64" => Reinterpret.toIntBits(b, 8, signed = false)
      case "i8" => Reinterpret.toIntBits(b, 1, signed = true).toByte
      case "i16" => Reinterpret.toIntBits(b, 2, signed = true).toShort
      case "i32" => Reinterpret.toIntBits(b, 4, signed = true).toInt
      case "i64" => Reinterpret.toIntBits(b, 8, signed = true)
      case "f32" =>
        java.lang.Float.intBitsToFloat(Reinterpret.toIntBits(b, 4, signed = false).toInt)
      case "f64" =>
        java.lang.Double.longBitsToDouble(Reinterpret.toIntBits(b, 8, signed = false))
      case "date" => // UInt16 epoch days -> Spark DateType (days Int)
        Reinterpret.toIntBits(b, 2, signed = false).toInt
      case "datetime" => // UInt32 epoch seconds -> Spark TimestampType (us Long)
        Reinterpret.toIntBits(b, 4, signed = false) * 1000000L
      case "string" => Reinterpret.toStringTrim(b)
      case "u128" | "i128" | "u256" | "i256" =>
        val width = if (target.endsWith("128")) 16 else 32
        val signed = target.startsWith("i")
        val le = java.util.Arrays.copyOf(b, width)
        val be = le.reverse
        val big =
          if (signed) new java.math.BigInteger(be)
          else new java.math.BigInteger(1, be)
        // DECIMAL(38,0) carries up to 10^38-1; wider values are outside
        // the engine's declared wide-integer domain — fail loudly
        if (big.abs.compareTo(new java.math.BigInteger("9" * 38)) > 0)
          throw new IllegalArgumentException(
            s"reinterpretAs${target.toUpperCase}: value exceeds DECIMAL(38,0)")
        org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(big), 38, 0)
      case "uuid" =>
        // first 8 LE bytes -> high half, next 8 LE -> low half
        val le = java.util.Arrays.copyOf(b, 16)
        def half(off: Int): Long = {
          var v = 0L
          var i = 7
          while (i >= 0) { v = (v << 8) | (le(off + i) & 0xFFL); i -= 1 }
          v
        }
        UTF8String.fromString(new java.util.UUID(half(0), half(8)).toString)
      case "fixedstring" => // raw bytes, NUL padding kept
        UTF8String.fromBytes(b)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): ChReinterpret =
    copy(child = newChild)
}
