package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Value-faithful ngram/wordShingle SimHash + MinHash family (reference
  * src/Functions/FunctionsStringHash.cpp, ExtractString.h) — the
  * reference's near-duplicate fingerprints. Persisted fingerprints must
  * be bit-identical for a dedup index built there to keep working here,
  * so every quirk of the reference algorithm is replicated:
  *
  *  - the shingle hash is hardware CRC32C chained over the shingle bytes
  *    with init 0xFFFFFFFF and NO final inversion
  *    (FunctionsStringHash.cpp:39-172 Hash::shingleHash);
  *    case-insensitive variants OR 0x20 into EVERY byte (letters and
  *    non-letters alike — that is the reference behavior);
  *  - ngram ASCII hashes every overlapping byte n-gram, but the UTF8
  *    variant's scan loop advances before hashing, so the FIRST
  *    codepoint n-gram is never hashed and an exactly-n-codepoint string
  *    SimHashes to 0 (FunctionsStringHash.cpp:220-250) — replicated;
  *  - word shingles are runs of ASCII-alphanumeric-or-non-ASCII bytes of
  *    length >= 4 (min_word_size), hashed as the concatenation of the
  *    current window ROTATED so the oldest word comes first
  *    (FunctionsStringHash.cpp:262-315; ExtractString.h:23-38); the
  *    UTF8-suffixed word-shingle names are the identical kernel;
  *  - MinHash keeps the num_hashes smallest / largest DISTINCT shingle
  *    hashes and folds them with CityHash Hash128to64 — the min side in
  *    DESCENDING hash order, the max side ASCENDING (std::map iteration
  *    order of the reference Heap, FunctionsStringHash.cpp:356-400);
  *  - defaults: shingle size 3, num_hashes 6 (FunctionsStringHash.h:33-34).
  */
object StringShingles {
  final val MinWordSize = 4

  // ---- raw CRC32C (reflected 0x82F63B78), init 0xFFFFFFFF, no final xor ----
  private val crcTab: Array[Int] = {
    val tab = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var j = 0
      while (j < 8) { c = if ((c & 1) != 0) 0x82F63B78 ^ (c >>> 1) else c >>> 1; j += 1 }
      tab(i) = c
      i += 1
    }
    tab
  }

  @inline private def crcByte(crc: Int, b: Int): Int =
    crcTab((crc ^ b) & 0xff) ^ (crc >>> 8)

  /** shingleHash over one byte run, chained from crc (32-bit state). */
  private def shingleCrc(crc0: Int, b: Array[Byte], from: Int, len: Int, ci: Boolean): Int = {
    var crc = crc0
    var i = from
    val end = from + len
    while (i < end) {
      val v = if (ci) (b(i) | 0x20) & 0xff else b(i) & 0xff
      crc = crcByte(crc, v)
      i += 1
    }
    crc
  }

  /** Single-fragment shingle hash (UInt64-widened 32-bit value). */
  def shingleHash(b: Array[Byte], from: Int, len: Int, ci: Boolean): Long =
    shingleCrc(0xFFFFFFFF, b, from, len, ci) & 0xffffffffL

  /** Multi-word shingle hash with rotation offset (words[offset..], then
    * words[0..offset)) — reference Hash::shingleHash(shingle, offset). */
  private def shingleHashWords(b: Array[Byte], words: Array[(Int, Int)], n: Int,
                               offset: Int, ci: Boolean): Long = {
    var crc = 0xFFFFFFFF
    var i = offset
    while (i < n) { crc = shingleCrc(crc, b, words(i)._1, words(i)._2, ci); i += 1 }
    i = 0
    while (i < offset) { crc = shingleCrc(crc, b, words(i)._1, words(i)._2, ci); i += 1 }
    crc & 0xffffffffL
  }

  // ---- UTF8 / word scanning (ExtractString.h) ----

  @inline private def isSep(b: Byte): Boolean = {
    val c = b & 0xff
    c < 128 && !((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))
  }

  /** Advance one UTF8 code from pos (clamped) — reference readOneUTF8Code. */
  @inline private def nextCp(b: Array[Byte], pos: Int, end: Int): Int = {
    val x = b(pos) & 0xff
    val len = if (x < 0x80) 1 else Integer.numberOfLeadingZeros(~(x << 24)) match {
      case 1 => 1 // continuation/invalid leading byte advances 1 (countl_one)
      case k => k
    }
    Math.min(pos + len, end)
  }

  // ---- SimHash ----

  def ngramSimHash(b: Array[Byte], shingleSize: Int, ci: Boolean, utf8: Boolean): Long = {
    val vec = new Array[Long](64)
    var any = false
    @inline def update(h: Long): Unit = {
      var i = 0
      while (i < 64) { vec(i) += (if ((h & (1L << i)) != 0) 1 else -1); i += 1 }
      any = true
    }
    if (!utf8) {
      if (b.length < shingleSize) return shingleHash(b, 0, b.length, ci)
      var pos = 0
      while (pos + shingleSize <= b.length) {
        update(shingleHash(b, pos, shingleSize, ci))
        pos += 1
      }
    } else {
      val end = b.length
      var wordEnd = 0
      var i = 0
      while (i < shingleSize) {
        if (wordEnd >= end) return shingleHash(b, 0, b.length, ci)
        wordEnd = nextCp(b, wordEnd, end)
        i += 1
      }
      var wordStart = 0
      while (wordEnd < end) {
        wordStart = nextCp(b, wordStart, wordEnd)
        wordEnd = nextCp(b, wordEnd, end)
        update(shingleHash(b, wordStart, wordEnd - wordStart, ci))
      }
    }
    var res = 0L
    var i = 0
    while (i < 64) { if (vec(i) > 0) res |= (1L << i); i += 1 }
    res
  }

  def wordShingleSimHash(b: Array[Byte], shingleSize: Int, ci: Boolean): Long = {
    val vec = new Array[Long](64)
    @inline def update(h: Long): Unit = {
      var i = 0
      while (i < 64) { vec(i) += (if ((h & (1L << i)) != 0) 1 else -1); i += 1 }
    }
    val end = b.length
    var pos = 0
    val words = new Array[(Int, Int)](shingleSize)
    var n = 0
    // first shingle
    while (pos < end && n < shingleSize) {
      while (pos < end && isSep(b(pos))) pos += 1
      val ws = pos
      while (pos < end && !isSep(b(pos))) pos += 1
      if (pos - ws >= MinWordSize) { words(n) = (ws, pos - ws); n += 1 }
    }
    if (n == 0) return 0L
    update(shingleHashWords(b, words, n, 0, ci))
    var offset = 0
    while (pos < end) {
      while (pos < end && isSep(b(pos))) pos += 1
      val ws = pos
      while (pos < end && !isSep(b(pos))) pos += 1
      if (pos - ws >= MinWordSize) {
        words(offset) = (ws, pos - ws)
        offset += 1
        if (offset >= shingleSize) offset = 0
        update(shingleHashWords(b, words, n, offset, ci))
      }
    }
    var res = 0L
    var i = 0
    while (i < 64) { if (vec(i) > 0) res |= (1L << i); i += 1 }
    res
  }

  // ---- MinHash heaps (K smallest / K largest DISTINCT hashes) ----

  private final class Heaps(k: Int) {
    val minH = new java.util.TreeMap[Long, (Int, Int)]() // keeps K smallest
    val maxH = new java.util.TreeMap[Long, (Int, Int)]() // keeps K largest
    def update(h: Long, from: Int, len: Int): Unit = {
      if (!minH.containsKey(h)) {
        minH.put(h, (from, len))
        if (minH.size > k) minH.remove(minH.lastKey())
      }
      if (!maxH.containsKey(h)) {
        maxH.put(h, (from, len))
        if (maxH.size > k) maxH.remove(maxH.firstKey())
      }
    }
    /** min side folds DESCENDING, max side ASCENDING (reference map order). */
    def minHash: Long = {
      var res = 0L
      val it = minH.descendingKeySet().iterator()
      while (it.hasNext) res = HashCompat.hash128to64(res, it.next())
      res
    }
    def maxHash: Long = {
      var res = 0L
      val it = maxH.keySet().iterator()
      while (it.hasNext) res = HashCompat.hash128to64(res, it.next())
      res
    }
    def minArgs(b: Array[Byte], k: Int): Array[UTF8String] = fill(b, k, minH.descendingMap())
    def maxArgs(b: Array[Byte], k: Int): Array[UTF8String] = fill(b, k, maxH)
    private def fill(b: Array[Byte], k: Int,
                     m: java.util.NavigableMap[Long, (Int, Int)]): Array[UTF8String] = {
      val out = new Array[UTF8String](k)
      val it = m.entrySet().iterator()
      var i = 0
      while (i < k) {
        if (it.hasNext) {
          val (from, len) = it.next().getValue
          out(i) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, from, from + len))
        } else out(i) = UTF8String.EMPTY_UTF8
        i += 1
      }
      out
    }
  }

  private def runMinHash(b: Array[Byte], shingleSize: Int, k: Int, ci: Boolean,
                         utf8: Boolean, ngram: Boolean): Heaps = {
    val heaps = new Heaps(k)
    val end = b.length
    if (ngram) {
      if (!utf8) {
        if (b.length < shingleSize) {
          heaps.update(shingleHash(b, 0, b.length, ci), 0, b.length)
          return heaps
        }
        var pos = 0
        while (pos + shingleSize <= end) {
          heaps.update(shingleHash(b, pos, shingleSize, ci), pos, shingleSize)
          pos += 1
        }
      } else {
        var wordEnd = 0
        var i = 0
        while (i < shingleSize) {
          if (wordEnd >= end) {
            heaps.update(shingleHash(b, 0, b.length, ci), 0, b.length)
            return heaps
          }
          wordEnd = nextCp(b, wordEnd, end)
          i += 1
        }
        var wordStart = 0
        while (wordEnd < end) {
          wordStart = nextCp(b, wordStart, wordEnd)
          wordEnd = nextCp(b, wordEnd, end)
          heaps.update(shingleHash(b, wordStart, wordEnd - wordStart, ci), wordStart, wordEnd - wordStart)
        }
      }
    } else {
      var pos = 0
      val words = new Array[(Int, Int)](shingleSize)
      var n = 0
      while (pos < end && n < shingleSize) {
        while (pos < end && isSep(b(pos))) pos += 1
        val ws = pos
        while (pos < end && !isSep(b(pos))) pos += 1
        if (pos - ws >= MinWordSize) { words(n) = (ws, pos - ws); n += 1 }
      }
      if (n == 0) return heaps
      // ref of the first shingle spans first word start .. last word end
      heaps.update(shingleHashWords(b, words, n, 0, ci),
        words(0)._1, words(n - 1)._1 + words(n - 1)._2 - words(0)._1)
      var offset = 0
      while (pos < end) {
        while (pos < end && isSep(b(pos))) pos += 1
        val ws = pos
        while (pos < end && !isSep(b(pos))) pos += 1
        if (pos - ws >= MinWordSize) {
          words(offset) = (ws, pos - ws)
          val shingleEnd = ws + (pos - ws)
          offset += 1
          if (offset >= shingleSize) offset = 0
          val shingleStart = words(offset)._1
          heaps.update(shingleHashWords(b, words, n, offset, ci),
            shingleStart, shingleEnd - shingleStart)
        }
      }
    }
    heaps
  }

  def minHashPair(b: Array[Byte], n: Int, k: Int, ci: Boolean, utf8: Boolean,
                  ngram: Boolean): (Long, Long) = {
    val h = runMinHash(b, n, k, ci, utf8, ngram)
    (h.minHash, h.maxHash)
  }

  def minHashArgs(b: Array[Byte], n: Int, k: Int, ci: Boolean, utf8: Boolean,
                  ngram: Boolean): (Array[UTF8String], Array[UTF8String]) = {
    val h = runMinHash(b, n, k, ci, utf8, ngram)
    (h.minArgs(b, k), h.maxArgs(b, k))
  }
}

/** SimHash expression: ngram (ASCII/UTF8) or word-shingle; Long result. */
case class ChStringSimHash(child: Expression, shingleSize: Int, ci: Boolean,
                           utf8: Boolean, ngram: Boolean) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    if (ngram) StringShingles.ngramSimHash(b, shingleSize, ci, utf8)
    else StringShingles.wordShingleSimHash(b, shingleSize, ci)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      if (ngram)
        s"${ev.value} = graft.functions.StringShingles.ngramSimHash($a.getBytes(), $shingleSize, $ci, $utf8);"
      else
        s"${ev.value} = graft.functions.StringShingles.wordShingleSimHash($a.getBytes(), $shingleSize, $ci);")
  override protected def withNewChildInternal(newChild: Expression): ChStringSimHash =
    copy(child = newChild)
}

/** MinHash expression: Tuple(UInt64, UInt64) -> struct(_1, _2). */
case class ChStringMinHash(child: Expression, shingleSize: Int, k: Int, ci: Boolean,
                           utf8: Boolean, ngram: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("_1", LongType, nullable = false),
    StructField("_2", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any = {
    val (lo, hi) = StringShingles.minHashPair(
      input.asInstanceOf[UTF8String].getBytes, shingleSize, k, ci, utf8, ngram)
    InternalRow(lo, hi)
  }
  override protected def withNewChildInternal(newChild: Expression): ChStringMinHash =
    copy(child = newChild)
}

/** MinHashArg expression: the shingles behind the kept hashes —
  * struct(_1: array<string>, _2: array<string>), k entries each,
  * padded with '' (reference insertDefault). */
case class ChStringMinHashArg(child: Expression, shingleSize: Int, k: Int, ci: Boolean,
                              utf8: Boolean, ngram: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("_1", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("_2", ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullSafeEval(input: Any): Any = {
    val (mins, maxs) = StringShingles.minHashArgs(
      input.asInstanceOf[UTF8String].getBytes, shingleSize, k, ci, utf8, ngram)
    InternalRow(new GenericArrayData(mins.asInstanceOf[Array[Any]]),
      new GenericArrayData(maxs.asInstanceOf[Array[Any]]))
  }
  override protected def withNewChildInternal(newChild: Expression): ChStringMinHashArg =
    copy(child = newChild)
}
