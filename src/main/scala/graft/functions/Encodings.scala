package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** The try* spelling: returns the EMPTY STRING on malformed input
  * (reference tryBase58Decode docs — not NULL). */
case class Base58Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val r = Encodings.base58DecodeEval(input.asInstanceOf[UTF8String])
    if (r == null) UTF8String.EMPTY_UTF8 else r
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.Encodings.base58DecodeEval($a);
      if (${ev.value} == null)
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8;""")
  override protected def withNewChildInternal(c: Expression): Base58Decode = copy(c)
}

case class Base58DecodeStrict(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Encodings.base58DecodeStrictEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Encodings.base58DecodeStrictEval($a);")
  override protected def withNewChildInternal(c: Expression): Base58DecodeStrict = copy(c)
}

case class Base32DecodeStrict(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Encodings.base32DecodeStrictEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Encodings.base32DecodeStrictEval($a);")
  override protected def withNewChildInternal(c: Expression): Base32DecodeStrict = copy(c)
}

case class Base64DecodeStrict(child: Expression, urlVariant: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Encodings.base64DecodeStrictEval(input.asInstanceOf[UTF8String], urlVariant)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Encodings.base64DecodeStrictEval($a, $urlVariant);")
  override protected def withNewChildInternal(c: Expression): Base64DecodeStrict =
    copy(child = c)
}

/** URL-safe unpadded base64 (reference base64URLEncode.cpp). Spark's
  * built-in base64() MIME-chunks outputs over 76 chars — unusable here. */
case class Base64UrlEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Encodings.base64UrlEncodeEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Encodings.base64UrlEncodeEval($a);")
  override protected def withNewChildInternal(c: Expression): Base64UrlEncode =
    copy(c)
}

case class Base64DecodeTry(child: Expression, urlVariant: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Encodings.base64DecodeTryEval(input.asInstanceOf[UTF8String], urlVariant)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Encodings.base64DecodeTryEval($a, $urlVariant);")
  override protected def withNewChildInternal(c: Expression): Base64DecodeTry =
    copy(child = c)
}

/** RFC 4648 base32 (reference src/Functions/ FunctionBase32Conversion
  * family): standard alphabet A-Z2-7 with '=' padding. */
case class Base32Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Encodings.base32EncodeEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Encodings.base32EncodeEval($a);")
  override protected def withNewChildInternal(c: Expression): Base32Encode = copy(c)
}

case class Base32Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Encodings.base32DecodeEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.Encodings.base32DecodeEval($a);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): Base32Decode = copy(c)
}

/** Bech32 / bech32m segwit-address codec (reference
  * src/Functions/bech32.cpp; algorithm from the public BIP-0173/0350
  * specifications): encode(hrp, programBytes, witver) emits
  * hrp + '1' + base32(witver :: 5-bit groups) + 6-symbol checksum;
  * witver 0 uses the bech32 checksum constant, >0 the bech32m constant.
  * Decode verifies the checksum and returns 'hrp:witver:hex(program)';
  * NULL on any malformed input. */
case class Bech32Encode(left: Expression, right: Expression, witver: Int)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(hrp: Any, data: Any): Any =
    Encodings.bech32EncodeEval(hrp.asInstanceOf[UTF8String], data, witver)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.Encodings.bech32EncodeEval($a, $b, $witver);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class Bech32Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Encodings.bech32DecodeEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.Encodings.bech32DecodeEval($a);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): Bech32Decode = copy(c)
}

/** detectCharset (reference FunctionsCharsetClassification.cpp — byte
  * 2-gram frequency model there; here a decode-based heuristic over the
  * raw bytes): all bytes < 0x80 -> US-ASCII, strictly-valid UTF-8 ->
  * UTF-8, anything else -> ISO-8859-1 (every byte string decodes as
  * Latin-1, the standard fallback). */
case class DetectCharset(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Encodings.detectCharsetEval(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Encodings.detectCharsetEval($a);")
  override protected def withNewChildInternal(c: Expression): DetectCharset = copy(c)
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

  // ------------------------------------------------------------ base32

  private val b32Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val b32Index: Array[Int] = {
    val a = Array.fill(128)(-1)
    b32Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    // the reference decoder is case-insensitive (03447: 'my======')
    b32Alphabet.zipWithIndex.foreach { case (c, i) =>
      if (c.isLetter) a(c.toLower.toInt) = i }
    a
  }

  /** RFC 4648 §6 base32 of the UTF-8 bytes (8 symbols per 5-byte group,
    * '=' padding; §10 test vectors pinned in CodecsSpec). */
  def base32EncodeEval(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val out = new java.lang.StringBuilder((b.length + 4) / 5 * 8)
    var i = 0
    while (i < b.length) {
      val chunk = math.min(5, b.length - i)
      var acc = 0L
      var j = 0
      while (j < chunk) { acc = (acc << 8) | (b(i + j) & 0xffL); j += 1 }
      acc <<= 8 * (5 - chunk)
      val symbols = (chunk * 8 + 4) / 5
      var k = 0
      while (k < 8) {
        if (k < symbols) out.append(b32Alphabet(((acc >>> (35 - 5 * k)) & 31).toInt))
        else out.append('=')
        k += 1
      }
      i += chunk
    }
    UTF8String.fromString(out.toString)
  }

  /** Inverse of base32EncodeEval; null on non-alphabet characters or
    * non-canonical input: the final group's symbol count must be one an
    * encoder can produce (2, 4, 5, 7, or 8 — 'M=======' with 1 symbol is
    * rejected) and its leftover low bits must be zero (RFC 4648 §3.5
    * canonical-encoding check; round-7 advice). */
  def base32DecodeEval(s: UTF8String): UTF8String = {
    val str = s.toString
    val body = str.indexOf('=') match {
      case -1 => str
      case 0 => return null // padding-only input is malformed (03447)
      case p => if (str.substring(p).forall(_ == '=')) str.substring(0, p) else return null
    }
    if (str.nonEmpty && str.length % 8 != 0) return null
    // Valid symbol counts mod 8: 0 (full group) or 2/4/5/7 (1/2/3/4 bytes).
    val tail = body.length % 8
    if (tail == 1 || tail == 3 || tail == 6) return null
    var acc = 0L
    var bits = 0
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      val d = if (c < 128) b32Index(c.toInt) else -1
      if (d < 0) return null
      acc = (acc << 5) | d
      bits += 5
      if (bits >= 8) {
        bits -= 8
        out.write(((acc >>> bits) & 0xff).toInt)
      }
      i += 1
    }
    // Canonical: any bits left over in the final partial group must be 0.
    if (bits > 0 && (acc & ((1L << bits) - 1)) != 0) return null
    UTF8String.fromBytes(out.toByteArray)
  }

  // ------------------------------------------------------ bech32/bech32m

  private val bechCharset = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
  private val bechIndex: Array[Int] = {
    val a = Array.fill(128)(-1)
    bechCharset.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }
  private val bechGen = Array(0x3b6a57b2, 0x26508e6d, 0x1ea119fa, 0x3d4233dd, 0x2a1462b3)
  private final val Bech32mConst = 0x2bc830a3

  private def bechPolymod(values: Seq[Int]): Int = {
    var chk = 1
    for (v <- values) {
      val b = chk >>> 25
      chk = ((chk & 0x1ffffff) << 5) ^ v
      var i = 0
      while (i < 5) { if (((b >>> i) & 1) != 0) chk ^= bechGen(i); i += 1 }
    }
    chk
  }

  private def bechHrpExpand(hrp: String): Seq[Int] =
    hrp.map(c => (c >> 5).toInt) ++ Seq(0) ++ hrp.map(c => (c & 31).toInt)

  /** General power-of-two base conversion (BIP-0173 reference algorithm);
    * null when strict (pad=false) and leftover bits are non-canonical. */
  private def convertBits(data: Seq[Int], from: Int, to: Int,
                          pad: Boolean): Option[Seq[Int]] = {
    var acc = 0
    var bits = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val maxv = (1 << to) - 1
    for (v <- data) {
      if (v < 0 || (v >>> from) != 0) return None
      acc = (acc << from) | v
      bits += from
      while (bits >= to) { bits -= to; out += (acc >>> bits) & maxv }
    }
    if (pad) { if (bits > 0) out += (acc << (to - bits)) & maxv }
    else if (bits >= from || ((acc << (to - bits)) & maxv) != 0) return None
    Some(out.toSeq)
  }

  def bech32EncodeEval(hrp: UTF8String, data: Any, witver: Int): UTF8String = {
    val h = hrp.toString.toLowerCase
    if (h.isEmpty || h.length > 83 || h.exists(c => c < 33 || c > 126)) return null
    val bytes = data match {
      case b: Array[Byte] => b
      case s: UTF8String => s.getBytes
      case _ => return null
    }
    convertBits(bytes.map(_ & 0xff).toSeq, 8, 5, pad = true) match {
      case None => null
      case Some(groups) =>
        val payload = witver +: groups
        val const = if (witver == 0) 1 else Bech32mConst
        val pm = bechPolymod(bechHrpExpand(h) ++ payload ++ Seq(0, 0, 0, 0, 0, 0)) ^ const
        val checksum = (0 until 6).map(i => (pm >>> (5 * (5 - i))) & 31)
        val sb = new java.lang.StringBuilder(h).append('1')
        (payload ++ checksum).foreach(v => sb.append(bechCharset(v)))
        if (sb.length() > 90) null else UTF8String.fromString(sb.toString)
    }
  }

  /** Decode to 'hrp:witver:hex(program)'; null on bad charset, checksum,
    * or non-canonical padding. */
  def bech32DecodeEval(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str != str.toLowerCase && str != str.toUpperCase) return null
    val lower = str.toLowerCase
    val sep = lower.lastIndexOf('1')
    if (sep < 1 || sep + 7 > lower.length || lower.length > 90) return null
    val hrp = lower.substring(0, sep)
    if (hrp.exists(c => c < 33 || c > 126)) return null
    val dataPart = lower.substring(sep + 1)
    val values = new Array[Int](dataPart.length)
    var i = 0
    while (i < dataPart.length) {
      val c = dataPart.charAt(i)
      val d = if (c < 128) bechIndex(c.toInt) else -1
      if (d < 0) return null
      values(i) = d
      i += 1
    }
    val pm = bechPolymod(bechHrpExpand(hrp) ++ values.toSeq)
    val witver = values(0)
    val expected = if (witver == 0) 1 else Bech32mConst
    if (pm != expected) return null
    convertBits(values.slice(1, values.length - 6).toSeq, 5, 8, pad = false) match {
      case None => null
      case Some(bytes) =>
        val hex = bytes.map(b => f"$b%02x").mkString
        UTF8String.fromString(s"$hrp:$witver:$hex")
    }
  }

  def detectCharsetEval(bytes: Array[Byte]): UTF8String = {
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if ((bytes(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return UTF8String.fromString("US-ASCII")
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(bytes)); UTF8String.fromString("UTF-8") }
    catch { case _: java.nio.charset.CharacterCodingException =>
      UTF8String.fromString("ISO-8859-1") }
  }

  /** IDNA ToASCII of a dotted domain (java.net.IDN — the same RFC 3490
    * pipeline the reference wraps); null on labels IDNA rejects. */
  def idnaEncodeEval(s: UTF8String): UTF8String =
    try UTF8String.fromString(java.net.IDN.toASCII(s.toString))
    catch { case _: IllegalArgumentException => null }

  def idnaDecodeEval(s: UTF8String): UTF8String =
    try UTF8String.fromString(java.net.IDN.toUnicode(s.toString))
    catch { case _: IllegalArgumentException => null }

  /** Strict (throwing) decode kernels — the reference's base58Decode /
    * base32Decode / base64Decode raise INCORRECT_DATA on malformed input
    * (FunctionBase58Conversion.cpp); only the try* spellings return a
    * default. */
  def base58DecodeStrictEval(s: UTF8String): UTF8String = {
    val r = base58DecodeEval(s)
    if (r == null) throw new IllegalArgumentException(
      s"INCORRECT_DATA: Invalid Base58 value: '$s'")
    r
  }

  def base32DecodeStrictEval(s: UTF8String): UTF8String = {
    val r = base32DecodeEval(s)
    if (r == null) throw new IllegalArgumentException(
      s"INCORRECT_DATA: Invalid Base32 value: '$s'")
    r
  }

  def base64DecodeStrictEval(s: UTF8String, url: Boolean): UTF8String = {
    val str = s.toString
    // no whitespace stripping: embedded whitespace is INCORRECT_DATA
    // (the basic java decoder rejects it below); the URL alphabet has
    // no '+'/'/' — those must fail BEFORE translation
    if (url && (str.indexOf('+') >= 0 || str.indexOf('/') >= 0))
      throw new IllegalArgumentException(
        s"INCORRECT_DATA: Failed to decode Base64: '$str'")
    val norm = if (url) str.replace('-', '+').replace('_', '/') else str
    // the standard alphabet requires full 4-symbol groups ('foo' is
    // INCORRECT_DATA, 00732); the URL variant accepts unpadded tails
    if (!url && norm.length % 4 != 0)
      throw new IllegalArgumentException(
        s"INCORRECT_DATA: Failed to decode Base64: '$str'")
    try UTF8String.fromBytes(java.util.Base64.getDecoder.decode(norm))
    catch {
      case _: IllegalArgumentException => throw new IllegalArgumentException(
        s"INCORRECT_DATA: Failed to decode Base64: '$str'")
    }
  }

  def base64UrlEncodeEval(s: UTF8String): UTF8String =
    UTF8String.fromString(java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes))

  def base64DecodeTryEval(s: UTF8String, url: Boolean): UTF8String =
    try base64DecodeStrictEval(s, url)
    catch { case _: IllegalArgumentException => UTF8String.EMPTY_UTF8 }

  def base58Encode(c: Column): Column = column(Base58Encode(expression(c)))
  def base58Decode(c: Column): Column = column(Base58Decode(expression(c)))
  def base32Encode(c: Column): Column = column(Base32Encode(expression(c)))
  def base32Decode(c: Column): Column = column(Base32Decode(expression(c)))
  def bech32Encode(hrp: Column, data: Column, witver: Int = 0): Column =
    column(Bech32Encode(expression(hrp), expression(data), witver))
  def bech32Decode(c: Column): Column = column(Bech32Decode(expression(c)))
  def idnaEncode(c: Column): Column = column(IdnaEncode(expression(c)))
  def idnaDecode(c: Column): Column = column(IdnaDecode(expression(c)))
}
