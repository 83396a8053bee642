package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String codecs tail (reference: src/Functions/FunctionBase58Conversion.cpp
  * — Bitcoin-alphabet base58; src/Functions/idna.cpp + punycode.cpp — IDNA
  * domain encoding). Stateless scalar kernels, codegen through the static
  * entry points. Decode returns NULL on malformed input (the reference's
  * tryBase58Decode behavior; the throwing variant is the same kernel
  * wrapped in an assertNotNull by the caller). */
case class Base58Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Encodings.base58EncodeEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Encodings.base58EncodeEval($a);")
  override protected def withNewChildInternal(c: Expression): Base58Encode = copy(c)
}

case class Base58Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Encodings.base58DecodeEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.Encodings.base58DecodeEval($a);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): Base58Decode = copy(c)
}

case class IdnaEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Encodings.idnaEncodeEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.Encodings.idnaEncodeEval($a);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): IdnaEncode = copy(c)
}

case class IdnaDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Encodings.idnaDecodeEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.Encodings.idnaDecodeEval($a);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): IdnaDecode = copy(c)
}

object Encodings {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  private val alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val indexOf: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Bitcoin-alphabet base58 of the UTF-8 bytes (leading zero bytes map
    * to leading '1's, big-integer base conversion for the rest). */
  def base58EncodeEval(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return UTF8String.fromString("")
    var zeros = 0
    while (zeros < bytes.length && bytes(zeros) == 0) zeros += 1
    // repeated divmod on a working copy (base 256 -> base 58)
    val work = java.util.Arrays.copyOf(bytes, bytes.length)
    val out = new StringBuilder
    var start = zeros
    while (start < work.length) {
      var rem = 0
      var i = start
      while (i < work.length) {
        val cur = rem * 256 + (work(i) & 0xff)
        work(i) = (cur / 58).toByte
        rem = cur % 58
        i += 1
      }
      out.append(alphabet(rem))
      if (work(start) == 0) start += 1
    }
    // strip surplus leading '1's produced by the conversion loop, then
    // re-add one per actual leading zero byte
    val rev = out.reverse.toString.dropWhile(_ == '1')
    UTF8String.fromString("1" * zeros + rev)
  }

  /** Inverse of base58EncodeEval; null on characters outside the
    * alphabet. */
  def base58DecodeEval(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.isEmpty) return UTF8String.fromString("")
    var zeros = 0
    while (zeros < str.length && str.charAt(zeros) == '1') zeros += 1
    val digits = new Array[Int](str.length - zeros)
    var i = zeros
    while (i < str.length) {
      val c = str.charAt(i)
      val d = if (c < 128) indexOf(c.toInt) else -1
      if (d < 0) return null
      digits(i - zeros) = d
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream
    var start = 0
    while (start < digits.length) {
      var rem = 0
      var j = start
      while (j < digits.length) {
        val cur = rem * 58 + digits(j)
        digits(j) = cur / 256
        rem = cur % 256
        j += 1
      }
      out.write(rem)
      if (digits(start) == 0) start += 1
    }
    // strip surplus leading zero bytes from the conversion, then re-add
    // one per actual leading '1'
    val tail = out.toByteArray.reverse.dropWhile(_ == 0)
    val res = new Array[Byte](zeros + tail.length)
    System.arraycopy(tail, 0, res, zeros, tail.length)
    UTF8String.fromBytes(res)
  }

  /** IDNA ToASCII of a dotted domain (java.net.IDN — the same RFC 3490
    * pipeline the reference wraps); null on labels IDNA rejects. */
  def idnaEncodeEval(s: UTF8String): UTF8String =
    try UTF8String.fromString(java.net.IDN.toASCII(s.toString))
    catch { case _: IllegalArgumentException => null }

  def idnaDecodeEval(s: UTF8String): UTF8String =
    try UTF8String.fromString(java.net.IDN.toUnicode(s.toString))
    catch { case _: IllegalArgumentException => null }

  def base58Encode(c: Column): Column = column(Base58Encode(expression(c)))
  def base58Decode(c: Column): Column = column(Base58Decode(expression(c)))
  def idnaEncode(c: Column): Column = column(IdnaEncode(expression(c)))
  def idnaDecode(c: Column): Column = column(IdnaDecode(expression(c)))
}
