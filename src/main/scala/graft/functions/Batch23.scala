package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 batch 23: the remaining cryptographic digests and the
  * Oblakov consistent hash.
  *
  *  - MD4 (RFC 1320), RIPEMD-160 (Dobbertin/Bosselaers/Preneel 1996
  *    published spec), Keccak-256 (pre-NIST Keccak padding 0x01 — the
  *    Ethereum variant the reference exposes as keccak256,
  *    src/Functions/FunctionsHashing.h), SHA-512/256 (FIPS 180-4, via
  *    the JDK provider), BLAKE3 (the public spec: 7-round compression,
  *    1 KiB chunks, binary tree with largest-power-of-two left split).
  *    Every digest is pinned in ChSqlSpec against its published
  *    empty-string / 'abc' test vector.
  *  - kostikConsistentHash (reference contrib/consistent-hashing —
  *    Konstantin Oblakov's O(1) scheme; yandexConsistentHash alias).
  *
  * All digests return Binary (the reference returns FixedString —
  * hex() renders both the same way).
  */
object Batch23 {

  // ---------------------------------------------------------------- MD4
  private def rotl(x: Int, s: Int): Int = Integer.rotateLeft(x, s)

  def md4(msg: Array[Byte]): Array[Byte] = {
    val padded = mdPad(msg)
    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    val x = new Array[Int](16)
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < 16) {
        x(i) = (padded(off + 4 * i) & 0xFF) | ((padded(off + 4 * i + 1) & 0xFF) << 8) |
          ((padded(off + 4 * i + 2) & 0xFF) << 16) | ((padded(off + 4 * i + 3) & 0xFF) << 24)
        i += 1
      }
      val (aa, bb, cc, dd) = (a, b, c, d)
      def f(u: Int, v: Int, w: Int) = (u & v) | (~u & w)
      def g(u: Int, v: Int, w: Int) = (u & v) | (u & w) | (v & w)
      def h(u: Int, v: Int, w: Int) = u ^ v ^ w
      // round 1
      val s1 = Array(3, 7, 11, 19)
      i = 0
      while (i < 16) {
        val t = rotl(a + f(b, c, d) + x(i), s1(i % 4))
        a = d; d = c; c = b; b = t
        i += 1
      }
      // round 2
      val s2 = Array(3, 5, 9, 13)
      val k2 = Array(0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15)
      i = 0
      while (i < 16) {
        val t = rotl(a + g(b, c, d) + x(k2(i)) + 0x5a827999, s2(i % 4))
        a = d; d = c; c = b; b = t
        i += 1
      }
      // round 3
      val s3 = Array(3, 9, 11, 15)
      val k3 = Array(0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)
      i = 0
      while (i < 16) {
        val t = rotl(a + h(b, c, d) + x(k3(i)) + 0x6ed9eba1, s3(i % 4))
        a = d; d = c; c = b; b = t
        i += 1
      }
      a += aa; b += bb; c += cc; d += dd
      off += 64
    }
    leWords(Array(a, b, c, d))
  }

  /** MD4/MD5/RIPEMD shared padding: 0x80, zeros, 64-bit LE bit length. */
  private def mdPad(msg: Array[Byte]): Array[Byte] = {
    val bitLen = msg.length.toLong * 8
    val padLen = ((56 - (msg.length + 1) % 64) % 64 + 64) % 64
    val out = new Array[Byte](msg.length + 1 + padLen + 8)
    System.arraycopy(msg, 0, out, 0, msg.length)
    out(msg.length) = 0x80.toByte
    var i = 0
    while (i < 8) { out(out.length - 8 + i) = ((bitLen >>> (8 * i)) & 0xFF).toByte; i += 1 }
    out
  }

  private def leWords(ws: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](ws.length * 4)
    var i = 0
    while (i < ws.length) {
      var j = 0
      while (j < 4) { out(4 * i + j) = ((ws(i) >>> (8 * j)) & 0xFF).toByte; j += 1 }
      i += 1
    }
    out
  }

  // --------------------------------------------------------- RIPEMD-160
  private val ripR = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13)
  private val ripRp = Array(
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11)
  private val ripS = Array(
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6)
  private val ripSp = Array(
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11)
  private val ripK = Array(0x00000000, 0x5a827999, 0x6ed9eba1, 0x8f1bbcdc, 0xa953fd4e)
  private val ripKp = Array(0x50a28be6, 0x5c4dd124, 0x6d703ef3, 0x7a6d76e9, 0x00000000)

  private def ripF(j: Int, x: Int, y: Int, z: Int): Int = j / 16 match {
    case 0 => x ^ y ^ z
    case 1 => (x & y) | (~x & z)
    case 2 => (x | ~y) ^ z
    case 3 => (x & z) | (y & ~z)
    case 4 => x ^ (y | ~z)
  }

  def ripemd160(msg: Array[Byte]): Array[Byte] = {
    val padded = mdPad(msg)
    val h = Array(0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476, 0xc3d2e1f0)
    val x = new Array[Int](16)
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < 16) {
        x(i) = (padded(off + 4 * i) & 0xFF) | ((padded(off + 4 * i + 1) & 0xFF) << 8) |
          ((padded(off + 4 * i + 2) & 0xFF) << 16) | ((padded(off + 4 * i + 3) & 0xFF) << 24)
        i += 1
      }
      var (al, bl, cl, dl, el) = (h(0), h(1), h(2), h(3), h(4))
      var (ar, br, cr, dr, er) = (h(0), h(1), h(2), h(3), h(4))
      var j = 0
      while (j < 80) {
        var t = rotl(al + ripF(j, bl, cl, dl) + x(ripR(j)) + ripK(j / 16), ripS(j)) + el
        al = el; el = dl; dl = rotl(cl, 10); cl = bl; bl = t
        t = rotl(ar + ripF(79 - j, br, cr, dr) + x(ripRp(j)) + ripKp(j / 16), ripSp(j)) + er
        ar = er; er = dr; dr = rotl(cr, 10); cr = br; br = t
        j += 1
      }
      val t = h(1) + cl + dr
      h(1) = h(2) + dl + er
      h(2) = h(3) + el + ar
      h(3) = h(4) + al + br
      h(4) = h(0) + bl + cr
      h(0) = t
      off += 64
    }
    leWords(h)
  }

  // --------------------------------------------------------- Keccak-256
  private val keccakRC = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808AL,
    0x8000000080008000L, 0x000000000000808BL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008AL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000AL,
    0x000000008000808BL, 0x800000000000008BL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800AL, 0x800000008000000AL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)
  private val keccakRot = Array(
    Array(0, 36, 3, 41, 18), Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61), Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private def keccakF(a: Array[Long]): Unit = {
    val b = new Array[Long](25)
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    var round = 0
    while (round < 24) {
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        x += 1
      }
      var y = 0
      while (y < 5) {
        x = 0
        while (x < 5) { a(x + 5 * y) ^= d(x); x += 1 }
        y += 1
      }
      // rho + pi: B[y, (2x+3y) mod 5] = rotl(A[x, y], r[x][y])
      x = 0
      while (x < 5) {
        y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), keccakRot(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      y = 0
      while (y < 5) {
        x = 0
        while (x < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          x += 1
        }
        y += 1
      }
      a(0) ^= keccakRC(round)
      round += 1
    }
  }

  /** Keccak-256 with the ORIGINAL 0x01 padding (pre-NIST; what the
    * reference's keccak256 computes), rate 1088 bits / 136 bytes. */
  def keccak256(msg: Array[Byte]): Array[Byte] = {
    val rate = 136
    val state = new Array[Long](25)
    val padded = {
      val padLen = rate - (msg.length % rate)
      val out = new Array[Byte](msg.length + padLen)
      System.arraycopy(msg, 0, out, 0, msg.length)
      out(msg.length) = (out(msg.length) | 0x01).toByte
      out(out.length - 1) = (out(out.length - 1) | 0x80).toByte
      out
    }
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var w = 0L
        var j = 0
        while (j < 8) { w |= (padded(off + 8 * i + j) & 0xFFL) << (8 * j); j += 1 }
        state(i) ^= w
        i += 1
      }
      keccakF(state)
      off += rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) { out(8 * i + j) = ((state(i) >>> (8 * j)) & 0xFF).toByte; j += 1 }
      i += 1
    }
    out
  }

  // ------------------------------------------------------------- BLAKE3
  private val b3IV = Array(0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)
  private val b3Perm = Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)
  private final val ChunkStart = 1
  private final val ChunkEnd = 2
  private final val Parent = 4
  private final val Root = 8

  private def rotr(x: Int, s: Int): Int = Integer.rotateRight(x, s)

  private def b3Compress(cv: Array[Int], block: Array[Int], counter: Long,
                         blockLen: Int, flags: Int): Array[Int] = {
    val s = new Array[Int](16)
    System.arraycopy(cv, 0, s, 0, 8)
    System.arraycopy(b3IV, 0, s, 8, 4)
    s(12) = counter.toInt
    s(13) = (counter >>> 32).toInt
    s(14) = blockLen
    s(15) = flags
    var m = block.clone()
    def g(a: Int, b: Int, c: Int, d: Int, mx: Int, my: Int): Unit = {
      s(a) = s(a) + s(b) + mx
      s(d) = rotr(s(d) ^ s(a), 16)
      s(c) = s(c) + s(d)
      s(b) = rotr(s(b) ^ s(c), 12)
      s(a) = s(a) + s(b) + my
      s(d) = rotr(s(d) ^ s(a), 8)
      s(c) = s(c) + s(d)
      s(b) = rotr(s(b) ^ s(c), 7)
    }
    var round = 0
    while (round < 7) {
      g(0, 4, 8, 12, m(0), m(1)); g(1, 5, 9, 13, m(2), m(3))
      g(2, 6, 10, 14, m(4), m(5)); g(3, 7, 11, 15, m(6), m(7))
      g(0, 5, 10, 15, m(8), m(9)); g(1, 6, 11, 12, m(10), m(11))
      g(2, 7, 8, 13, m(12), m(13)); g(3, 4, 9, 14, m(14), m(15))
      if (round < 6) m = b3Perm.map(m)
      round += 1
    }
    val out = new Array[Int](16)
    var i = 0
    while (i < 8) {
      out(i) = s(i) ^ s(i + 8)
      out(i + 8) = s(i + 8) ^ cv(i)
      i += 1
    }
    out
  }

  private def b3Words(bytes: Array[Byte], off: Int, len: Int): Array[Int] = {
    val w = new Array[Int](16)
    var i = 0
    while (i < len) {
      w(i / 4) |= (bytes(off + i) & 0xFF) << (8 * (i % 4))
      i += 1
    }
    w
  }

  /** Chaining value of one <=1024-byte chunk (no ROOT flag). */
  private def b3ChunkCv(bytes: Array[Byte], off: Int, len: Int, counter: Long): Array[Int] = {
    var cv = b3IV.clone()
    val nBlocks = math.max(1, (len + 63) / 64)
    var i = 0
    while (i < nBlocks) {
      val bOff = off + 64 * i
      val bLen = math.min(64, len - 64 * i)
      var flags = 0
      if (i == 0) flags |= ChunkStart
      if (i == nBlocks - 1) flags |= ChunkEnd
      cv = b3Compress(cv, b3Words(bytes, bOff, math.max(0, bLen)), counter,
        math.max(0, bLen), flags).take(8)
      i += 1
    }
    cv
  }

  /** (cv-or-root): subtree over whole chunks; root handling done above. */
  private def b3Subtree(bytes: Array[Byte], off: Int, len: Int, chunkCounter: Long): Array[Int] = {
    if (len <= 1024) return b3ChunkCv(bytes, off, len, chunkCounter)
    // left = largest power-of-two multiple of 1024 strictly less than len
    var left = 1024L
    while (left * 2 < len) left *= 2
    val l = b3Subtree(bytes, off, left.toInt, chunkCounter)
    val r = b3Subtree(bytes, off + left.toInt, len - left.toInt, chunkCounter + left / 1024)
    b3Compress(b3IV.clone(), l ++ r, 0, 64, Parent).take(8)
  }

  def blake3(msg: Array[Byte]): Array[Byte] = {
    val rootWords: Array[Int] =
      if (msg.length <= 1024) {
        // single chunk: ROOT goes on the chunk's LAST block
        var cv = b3IV.clone()
        val nBlocks = math.max(1, (msg.length + 63) / 64)
        var out: Array[Int] = null
        var i = 0
        while (i < nBlocks) {
          val bLen = math.min(64, msg.length - 64 * i)
          var flags = 0
          if (i == 0) flags |= ChunkStart
          if (i == nBlocks - 1) flags |= ChunkEnd | Root
          val full = b3Compress(cv, b3Words(msg, 64 * i, math.max(0, bLen)), 0,
            math.max(0, bLen), flags)
          if (i == nBlocks - 1) out = full else cv = full.take(8)
          i += 1
        }
        out
      } else {
        var left = 1024L
        while (left * 2 < msg.length) left *= 2
        val l = b3Subtree(msg, 0, left.toInt, 0)
        val r = b3Subtree(msg, left.toInt, msg.length - left.toInt, left / 1024)
        b3Compress(b3IV.clone(), l ++ r, 0, 64, Parent | Root)
      }
    leWords(rootWords.take(8))
  }

  // --------------------------- Oblakov consistent hash (contrib cited) --
  private def bitCount(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** ConsistentHashing(x, n) for n <= 32768 — the uint16-block variant
    * (reference contrib/consistent-hashing/consistent_hashing.cpp). */
  def kostikConsistentHash(x: Long, n: Int): Int = {
    require(n > 0, "kostikConsistentHash: n must be positive")
    require(n <= 32768, "kostikConsistentHash: n must be <= 32768")
    val lo = x & 0xFFFFFFFFL
    val hi = x >>> 32
    val a = lo & 0xFFFFL
    val b = lo >>> 16
    val c = hi & 0xFFFFL
    val d = hi >>> 16
    if (n == 1) return 0
    def powersOf2Case(k2: Long): Long = {
      val cBlock = c & (k2 - 1)
      if (cBlock < 2) cBlock
      else {
        val y = bitCount(cBlock) - 1
        val y2 = 1L << y
        val ab = if (java.lang.Long.bitCount(cBlock) % 2 == 0) a else b
        y2 + (ab & (y2 - 1))
      }
    }
    val k = bitCount((n - 1).toLong)
    val k2 = 1L << k
    val largeValue = powersOf2Case(k2)
    if (largeValue < n) return largeValue.toInt
    val k21 = 1L << (k - 1)
    // asterisk bits: the unused high parts of a, b, c plus all of d
    var shift = 16 - k
    var res = (d << shift) | (c >>> k)
    shift += 1
    res = (res << shift) | (b >>> (k - 1))
    res = (res << shift) | (a >>> (k - 1))
    val s = java.lang.Long.remainderUnsigned(res, largeValue * (largeValue + 1))
    val largeValue2 = s / k2 + k21
    if (largeValue2 < n) largeValue2.toInt
    else powersOf2Case(k21).toInt
  }
}

/** toBFloat16: round-to-nearest-even truncation of Float32 to the
  * bfloat16 grid, returned as Float32 (reference DataTypeBFloat16 —
  * the value set is what matters; Spark has no 16-bit float). */
case class ToBFloat16Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = FloatType
  override def nullSafeEval(v: Any): Any = {
    val f = v.asInstanceOf[Number].floatValue
    val bits = java.lang.Float.floatToIntBits(f)
    val rounded = bits + 0x7FFF + ((bits >>> 16) & 1)
    java.lang.Float.intBitsToFloat(rounded & 0xFFFF0000)
  }
  override protected def withNewChildInternal(c: Expression): ToBFloat16Expr = copy(child = c)
}

/** JSONAllPaths / JSONAllPathsWithTypes (reference
  * src/Functions/JSONPaths.cpp over the dynamic JSON column type):
  * content-derived here — dotted paths to every leaf of the document in
  * sorted order; types render in the reference's spelling (Int64,
  * Float64, String, Bool, Null, Array(...)). The Dynamic/SharedData
  * spellings are column-layout introspection and stay out of scope. */
case class JsonAllPaths(child: Expression, withTypes: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (withTypes) MapType(StringType, StringType, valueContainsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    import org.json4s._
    val parsed =
      try org.json4s.jackson.JsonMethods.parse(v.toString)
      catch { case _: Exception => return null }
    val out = scala.collection.mutable.SortedMap.empty[String, String]
    def typeOf(j: JValue): String = j match {
      case _: JInt => "Int64"
      case _: JLong => "Int64"
      case _: JDouble => "Float64"
      case _: JDecimal => "Float64"
      case _: JString => "String"
      case _: JBool => "Bool"
      case JNull => "Null"
      case a: JArray =>
        val inner = a.arr.headOption.map(typeOf).getOrElse("Nothing")
        s"Array($inner)"
      case _ => "String"
    }
    def walk(prefix: String, j: JValue): Unit = j match {
      case JObject(fields) =>
        for ((k, sub) <- fields)
          walk(if (prefix.isEmpty) k else s"$prefix.$k", sub)
      case other if prefix.nonEmpty => out(prefix) = typeOf(other)
      case _ => ()
    }
    walk("", parsed)
    import org.apache.spark.unsafe.types.UTF8String
    if (withTypes)
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        out.keys.map(UTF8String.fromString).toArray[Any],
        out.values.map(UTF8String.fromString).toArray[Any])
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.keys.map(k => UTF8String.fromString(k): Any).toArray)
  }
  override protected def withNewChildInternal(c: Expression): JsonAllPaths = copy(child = c)
}

/** Digest expression over the batch-23 algorithms; returns Binary. */
case class ChDigest(child: Expression, algo: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case u: UTF8String => u.getBytes
      case b: Array[Byte] => b
      case other => other.toString.getBytes("UTF-8")
    }
    algo match {
      case "md4" => Batch23.md4(bytes)
      case "ripemd160" => Batch23.ripemd160(bytes)
      case "keccak256" => Batch23.keccak256(bytes)
      case "blake3" => Batch23.blake3(bytes)
      case "sha512_256" =>
        java.security.MessageDigest.getInstance("SHA-512/256").digest(bytes)
    }
  }
  override protected def withNewChildInternal(c: Expression): ChDigest = copy(child = c)
}

case class KostikConsistentHashExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(x: Any, n: Any): Any =
    Batch23.kostikConsistentHash(x.asInstanceOf[Number].longValue,
      n.asInstanceOf[Number].intValue)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KostikConsistentHashExpr =
    copy(left = l, right = r)
}

/** ULID (public spec: 10 Crockford-base32 time chars over unix millis +
  * 16 random chars); time-ordered, matches ULIDStringToDateTime's
  * decode. Nondeterministic per row (reference generateULID.cpp). */
case class GenerateUlid() extends org.apache.spark.sql.catalyst.expressions.LeafExpression
    with org.apache.spark.sql.catalyst.expressions.Nondeterministic with CodegenFallback {
  private val crockford = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  @transient private var rng: java.util.Random = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(System.nanoTime() ^ partitionIndex)
  override protected def evalInternal(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ms = System.currentTimeMillis()
    val sb = new java.lang.StringBuilder(26)
    var i = 9
    while (i >= 0) { sb.append(crockford(((ms >>> (5 * i)) & 31).toInt)); i -= 1 }
    i = 0
    while (i < 16) { sb.append(crockford(rng.nextInt(32))); i += 1 }
    UTF8String.fromString(sb.toString)
  }
  override def prettyName: String = "generate_ulid"
}

/** Per-name monotonic counter (reference generateSerialID.cpp keeps the
  * counter in Keeper; per-process here, documented). */
case class GenerateSerialId(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.Nondeterministic
    with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val name = child.eval(input)
    if (name == null) null
    else GenerateSerialId.counters
      .computeIfAbsent(name.toString, _ => new java.util.concurrent.atomic.AtomicLong(0))
      .getAndIncrement()
  }
  override protected def withNewChildInternal(c: Expression): GenerateSerialId = copy(child = c)
}
object GenerateSerialId {
  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
}

/** fuzzBits(s, prob): flip each BIT with the given probability
  * (reference fuzzBits.cpp; random, structural). */
case class FuzzBitsExpr(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.Nondeterministic
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  @transient private var rng: java.util.Random = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(System.nanoTime() ^ partitionIndex)
  override protected def evalInternal(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val (s, p) = (left.eval(input), right.eval(input))
    if (s == null || p == null) return null
    val bytes = (s match {
      case u: UTF8String => u.getBytes
      case b: Array[Byte] => b
    }).clone()
    val prob = p.asInstanceOf[Number].doubleValue
    var i = 0
    while (i < bytes.length) {
      var bit = 0
      while (bit < 8) {
        if (rng.nextDouble() < prob) bytes(i) = (bytes(i) ^ (1 << bit)).toByte
        bit += 1
      }
      i += 1
    }
    bytes
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FuzzBitsExpr =
    copy(left = l, right = r)
}
