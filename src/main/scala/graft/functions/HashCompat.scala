package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Value-faithful reimplementations of the reference's non-cryptographic
  * hash family (reference: src/Functions/FunctionsHashing.h, CRC.cpp,
  * src/Common/SipHash.h, src/Common/HashTable/Hash.h,
  * contrib/cityhash102/src/city.cc). Earlier rounds aliased these to
  * Spark's xxhash64, which computes DIFFERENT values (seed 42, typed
  * layout); any workload that persists hash values — `SAMPLE BY
  * cityHash64(id)`, sipHash64 fingerprints, murmur-based bucketing,
  * Kafka partition routing — needs the exact reference bit patterns to
  * survive an engine switch. These kernels compute them.
  *
  * All are pure static byte-array functions: per-row map-side work with
  * no state, so they run inside whole-stage codegen at any data scale
  * (ChHash* expressions below emit a single static call).
  *
  * Bit-level contracts (all from the reference, not from upstream HEAD):
  *  - sipHash64/128: SipHash-2-4, k0=k1=0 (SipHash.h:34-120); the 128-bit
  *    non-reference variant finalizes with v2^=0xff and returns
  *    (v0^v1, v2^v3) as two LE words (SipHash.h get128);
  *    sipHash128Reference is the official 128-bit spec (v1^=0xee at init,
  *    v2^=0xee finalize, second word after v1^=0xdd + 4 rounds —
  *    SipHash.cpp:9-27).
  *  - cityHash64: CityHash v1.0.2 exactly (the reference froze that
  *    version because values must never change; contrib/cityhash102).
  *  - murmurHash2_32(seed 0), murmurHash2_64 = MurmurHash64A(seed 0),
  *    gccMurmurHash = MurmurHash64A(seed 0xc70f6907) (libstdc++ compat),
  *    kafkaMurmurHash = MurmurHash2_32(seed 0x9747b28c) & 0x7fffffff
  *    (FunctionsHashing.h:371-447).
  *  - murmurHash3_32/64/128: MurmurHash3 x86_32 / x64_128 seed 0; the
  *    64-bit form is h1^h2 of the 128-bit state (FunctionsHashing.h:449-511).
  *  - xxHash32/64: XXH32/XXH64 seed 0 (FunctionsHashing.h:673-708).
  *  - javaHash: h = 31*h + signed byte (FunctionsHashing.h:514-557);
  *    javaHashUTF16LE pairs bytes LE after stripping a BOM;
  *    hiveHash = javaHash & 0x7FFFFFFF.
  *  - intHash32 (salt 0x75D9543DE018BF45) / intHash64
  *    (pre-xor 0x4CF2D2BAAE6DA887 + Murmur finalizer)
  *    (FunctionsHashing.h:173-191, HashTable/Hash.h:27-36,499-511).
  *  - halfMD5: first 8 MD5 bytes as a big-endian UInt64
  *    (FunctionsHashing.h:239-281).
  *  - CRC32 = zlib crc32 (init ~0, xorout ~0); CRC32IEEE / CRC64 use the
  *    reflected IEEE / ECMA polynomials with init 0 and no final xor
  *    (CRC.cpp:27-62).
  *  - wyHash64 = wyhash(s, len, 0, _wyp) (FunctionsHashing.h:1721-1730);
  *    implemented per the public wyhash_final_version_3 spec — the
  *    secret constants and mum mixing of that series.
  *
  * Unsigned return conventions: the reference returns UInt32/UInt64.
  * 32-bit results are widened to Spark LongType carrying the unsigned
  *  value (0..2^32-1) so they compare/display like the reference;
  * 64-bit results are LongType with the same two's-complement bits.
  * javaHash/hiveHash are Int32 in the reference and stay IntegerType.
  * 128-bit results are 16-byte BinaryType in the reference's memory
  * order (LE low word, then LE high word) — `hex()` of it matches
  * `hex(sipHash128(x))`.
  */
object HashCompat {

  // ---------- byte helpers ----------

  @inline private def load32LE(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  @inline private def load64LE(b: Array[Byte], i: Int): Long =
    (load32LE(b, i) & 0xffffffffL) | ((load32LE(b, i + 4) & 0xffffffffL) << 32)

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)
  @inline private def rotl32(x: Int, r: Int): Int = java.lang.Integer.rotateLeft(x, r)

  private def le8(x: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((x >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  // ---------- javaHash family ----------

  def javaHash(b: Array[Byte]): Int = {
    var h = 0
    var i = 0
    while (i < b.length) { h = 31 * h + b(i); i += 1 } // signed byte, like the reference's Int8 cast
    h
  }

  def javaHashUTF16LE(bytes: Array[Byte]): Int = {
    var off = 0
    var len = bytes.length
    if (len >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte) { off = 2; len -= 2 }
    if (len % 2 != 0)
      throw new IllegalArgumentException("Arguments for javaHashUTF16LE must be in the form of UTF-16")
    var h = 0
    var i = off
    val end = off + len
    while (i < end) {
      h = 31 * h + ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8))
      i += 2
    }
    h
  }

  def hiveHash(b: Array[Byte]): Int = javaHash(b) & 0x7FFFFFFF

  // ---------- intHash32 / intHash64 ----------

  /** Thomas Wang-style 64->32 mix with the reference's fixed salt. */
  def intHash32(x: Long): Long = {
    var key = x ^ 0x75D9543DE018BF45L
    key = (~key) + (key << 18)
    key = key ^ ((key >>> 31) | (key << 33))
    key = key * 21
    key = key ^ ((key >>> 11) | (key << 53))
    key = key + (key << 6)
    key = key ^ ((key >>> 22) | (key << 42))
    key & 0xffffffffL
  }

  /** Murmur finalizer over x ^ fixed-salt (reference IntHash64Impl). */
  def intHash64(x: Long): Long = {
    var v = x ^ 0x4CF2D2BAAE6DA887L
    v ^= v >>> 33
    v *= 0xff51afd7ed558ccdL
    v ^= v >>> 33
    v *= 0xc4ceb9fe1a85ec53L
    v ^= v >>> 33
    v
  }

  // ---------- MurmurHash2 ----------

  /** Appleby MurmurHash2 (32-bit), canonical layout. */
  def murmurHash2_32(b: Array[Byte], seed: Int): Int = {
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ b.length
    var i = 0
    val n4 = b.length & ~3
    while (i < n4) {
      var k = load32LE(b, i)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    val tail = b.length & 3
    if (tail >= 3) h ^= (b(i + 2) & 0xff) << 16
    if (tail >= 2) h ^= (b(i + 1) & 0xff) << 8
    if (tail >= 1) { h ^= b(i) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  /** Appleby MurmurHash64A. */
  def murmurHash64A(b: Array[Byte], seed: Long): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    var h = seed ^ (b.length * m)
    var i = 0
    val n8 = b.length & ~7
    while (i < n8) {
      var k = load64LE(b, i)
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 8
    }
    val tail = b.length & 7
    if (tail >= 7) h ^= (b(i + 6) & 0xffL) << 48
    if (tail >= 6) h ^= (b(i + 5) & 0xffL) << 40
    if (tail >= 5) h ^= (b(i + 4) & 0xffL) << 32
    if (tail >= 4) h ^= (b(i + 3) & 0xffL) << 24
    if (tail >= 3) h ^= (b(i + 2) & 0xffL) << 16
    if (tail >= 2) h ^= (b(i + 1) & 0xffL) << 8
    if (tail >= 1) { h ^= b(i) & 0xffL; h *= m }
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }

  def murmurHash2_32u(b: Array[Byte]): Long = murmurHash2_32(b, 0) & 0xffffffffL
  def murmurHash2_64(b: Array[Byte]): Long = murmurHash64A(b, 0L)
  def gccMurmurHash(b: Array[Byte]): Long = murmurHash64A(b, 0xc70f6907L)
  def kafkaMurmurHash(b: Array[Byte]): Long =
    (murmurHash2_32(b, 0x9747b28c) & 0x7fffffff).toLong

  // ---------- MurmurHash3 ----------

  def murmurHash3_32(b: Array[Byte]): Long = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0 // seed 0
    var i = 0
    val n4 = b.length & ~3
    while (i < n4) {
      var k = load32LE(b, i)
      k *= c1; k = rotl32(k, 15); k *= c2
      h ^= k; h = rotl32(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val tail = b.length & 3
    if (tail >= 3) k ^= (b(i + 2) & 0xff) << 16
    if (tail >= 2) k ^= (b(i + 1) & 0xff) << 8
    if (tail >= 1) {
      k ^= b(i) & 0xff
      k *= c1; k = rotl32(k, 15); k *= c2
      h ^= k
    }
    h ^= b.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h & 0xffffffffL
  }

  @inline private def fmix64(x: Long): Long = {
    var k = x
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** MurmurHash3 x64_128 (seed 0) -> (h1, h2). */
  def murmurHash3_128Pair(b: Array[Byte]): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ab62291120b7L
    var h1 = 0L
    var h2 = 0L
    val nblocks = b.length / 16
    var i = 0
    while (i < nblocks) {
      var k1 = load64LE(b, i * 16)
      var k2 = load64LE(b, i * 16 + 8)
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5
      i += 1
    }
    val t = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val tail = b.length & 15
    if (tail >= 15) k2 ^= (b(t + 14) & 0xffL) << 48
    if (tail >= 14) k2 ^= (b(t + 13) & 0xffL) << 40
    if (tail >= 13) k2 ^= (b(t + 12) & 0xffL) << 32
    if (tail >= 12) k2 ^= (b(t + 11) & 0xffL) << 24
    if (tail >= 11) k2 ^= (b(t + 10) & 0xffL) << 16
    if (tail >= 10) k2 ^= (b(t + 9) & 0xffL) << 8
    if (tail >= 9) {
      k2 ^= b(t + 8) & 0xffL
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (tail >= 8) k1 ^= (b(t + 7) & 0xffL) << 56
    if (tail >= 7) k1 ^= (b(t + 6) & 0xffL) << 48
    if (tail >= 6) k1 ^= (b(t + 5) & 0xffL) << 40
    if (tail >= 5) k1 ^= (b(t + 4) & 0xffL) << 32
    if (tail >= 4) k1 ^= (b(t + 3) & 0xffL) << 24
    if (tail >= 3) k1 ^= (b(t + 2) & 0xffL) << 16
    if (tail >= 2) k1 ^= (b(t + 1) & 0xffL) << 8
    if (tail >= 1) {
      k1 ^= b(t) & 0xffL
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= b.length; h2 ^= b.length
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  def murmurHash3_64(b: Array[Byte]): Long = {
    val (h1, h2) = murmurHash3_128Pair(b)
    h1 ^ h2
  }

  def murmurHash3_128(b: Array[Byte]): Array[Byte] = {
    val (h1, h2) = murmurHash3_128Pair(b)
    le8(h1) ++ le8(h2)
  }

  // ---------- SipHash-2-4 ----------

  private final class Sip(k0: Long, k1: Long, ref128: Boolean) {
    var v0: Long = 0x736f6d6570736575L ^ k0
    var v1: Long = 0x646f72616e646f6dL ^ k1
    var v2: Long = 0x6c7967656e657261L ^ k0
    var v3: Long = 0x7465646279746573L ^ k1
    if (ref128) v1 ^= 0xee

    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    def body(b: Array[Byte]): Long = { // returns the final word (len-tagged tail)
      val n8 = b.length & ~7
      var i = 0
      while (i < n8) {
        val m = load64LE(b, i)
        v3 ^= m; round(); round(); v0 ^= m
        i += 8
      }
      var last = (b.length.toLong & 0xff) << 56
      var shift = 0
      while (i < b.length) {
        last |= (b(i) & 0xffL) << shift
        shift += 8
        i += 1
      }
      last
    }

    def finalize64(last: Long): Long = {
      v3 ^= last; round(); round(); v0 ^= last
      v2 ^= 0xff
      round(); round(); round(); round()
      v0 ^ v1 ^ v2 ^ v3
    }
  }

  def sipHash64Keyed(k0: Long, k1: Long, b: Array[Byte]): Long = {
    val s = new Sip(k0, k1, ref128 = false)
    val last = s.body(b)
    s.finalize64(last)
  }

  def sipHash64(b: Array[Byte]): Long = sipHash64Keyed(0L, 0L, b)

  /** Reference-repo (non-official) 128-bit output: finalize with 0xff,
    * words (v0^v1, v2^v3) — SipHash.h get128. */
  def sipHash128Keyed(k0: Long, k1: Long, b: Array[Byte]): Array[Byte] = {
    val s = new Sip(k0, k1, ref128 = false)
    val last = s.body(b)
    s.v3 ^= last; s.round(); s.round(); s.v0 ^= last
    s.v2 ^= 0xff
    s.round(); s.round(); s.round(); s.round()
    le8(s.v0 ^ s.v1) ++ le8(s.v2 ^ s.v3)
  }

  def sipHash128(b: Array[Byte]): Array[Byte] = sipHash128Keyed(0L, 0L, b)

  /** Official SipHash 128-bit spec (reference SipHash.cpp get128Reference). */
  def sipHash128ReferenceKeyed(k0: Long, k1: Long, b: Array[Byte]): Array[Byte] = {
    val s = new Sip(k0, k1, ref128 = true)
    val last = s.body(b)
    s.v3 ^= last; s.round(); s.round(); s.v0 ^= last
    s.v2 ^= 0xee
    s.round(); s.round(); s.round(); s.round()
    val lo = s.v0 ^ s.v1 ^ s.v2 ^ s.v3
    s.v1 ^= 0xdd
    s.round(); s.round(); s.round(); s.round()
    val hi = s.v0 ^ s.v1 ^ s.v2 ^ s.v3
    le8(lo) ++ le8(hi)
  }

  def sipHash128Reference(b: Array[Byte]): Array[Byte] = sipHash128ReferenceKeyed(0L, 0L, b)

  // ---------- CityHash v1.0.2 ----------

  private val K0 = 0xc3a5c85c97cb3127L
  private val K1 = 0xb492b66fbe98f273L
  private val K2 = 0x9ae16a3b2f90404fL
  private val K3 = 0xc949d7c7509e6557L

  @inline private def cityRotate(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))

  @inline private def cityRotateAtLeast1(v: Long, shift: Int): Long =
    (v >>> shift) | (v << (64 - shift))

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** Hash128to64 (city.h) — also the reference's combineHashes for city. */
  def hash128to64(lo: Long, hi: Long): Long = {
    val kMul = 0x9ddfea08eb382d69L
    var a = (lo ^ hi) * kMul
    a ^= a >>> 47
    var b = (hi ^ a) * kMul
    b ^= b >>> 47
    b *= kMul
    b
  }

  private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def hashLen0to16(b: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = load64LE(b, off)
      val bb = load64LE(b, off + len - 8)
      hashLen16(a, cityRotateAtLeast1(bb + len, len)) ^ bb
    } else if (len >= 4) {
      val a = load32LE(b, off) & 0xffffffffL
      hashLen16(len + (a << 3), load32LE(b, off + len - 4) & 0xffffffffL)
    } else if (len > 0) {
      val a = b(off) & 0xff
      val bb = b(off + (len >> 1)) & 0xff
      val c = b(off + len - 1) & 0xff
      val y = a + (bb << 8)
      val z = len + (c << 2)
      shiftMix((y & 0xffffffffL) * K2 ^ (z & 0xffffffffL) * K3) * K2
    } else K2
  }

  private def hashLen17to32(b: Array[Byte], off: Int, len: Int): Long = {
    val a = load64LE(b, off) * K1
    val bb = load64LE(b, off + 8)
    val c = load64LE(b, off + len - 8) * K2
    val d = load64LE(b, off + len - 16) * K0
    hashLen16(
      cityRotate(a - bb, 43) + cityRotate(c, 30) + d,
      a + cityRotate(bb ^ K3, 20) - c + len)
  }

  private def hashLen33to64(b: Array[Byte], off: Int, len: Int): Long = {
    var z = load64LE(b, off + 24)
    var a = load64LE(b, off) + (len + load64LE(b, off + len - 16)) * K0
    var bb = cityRotate(a + z, 52)
    var c = cityRotate(a, 37)
    a += load64LE(b, off + 8)
    c += cityRotate(a, 7)
    a += load64LE(b, off + 16)
    val vf = a + z
    val vs = bb + cityRotate(a, 31) + c
    a = load64LE(b, off + 16) + load64LE(b, off + len - 32)
    z = load64LE(b, off + len - 8)
    bb = cityRotate(a + z, 52)
    c = cityRotate(a, 37)
    a += load64LE(b, off + len - 24)
    c += cityRotate(a, 7)
    a += load64LE(b, off + len - 16)
    val wf = a + z
    val ws = bb + cityRotate(a, 31) + c
    val r = shiftMix((vf + ws) * K2 + (wf + vs) * K0)
    shiftMix(r * K0 + vs) * K2
  }

  // WeakHashLen32WithSeeds on (w,x,y,z,a,b)
  @inline private def weakHash(w: Long, x: Long, y: Long, z: Long, a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = cityRotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += cityRotate(a, 44)
    (a + z, b + c)
  }

  @inline private def weakHash(b: Array[Byte], off: Int, a: Long, bb: Long): (Long, Long) =
    weakHash(load64LE(b, off), load64LE(b, off + 8), load64LE(b, off + 16), load64LE(b, off + 24), a, bb)

  def cityHash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n <= 32) {
      if (n <= 16) return hashLen0to16(bytes, 0, n)
      else return hashLen17to32(bytes, 0, n)
    } else if (n <= 64) return hashLen33to64(bytes, 0, n)

    var x = load64LE(bytes, 0)
    var y = load64LE(bytes, n - 16) ^ K1
    var z = load64LE(bytes, n - 56) ^ K0
    var v = weakHash(bytes, n - 64, n.toLong, y)
    var w = weakHash(bytes, n - 32, n.toLong * K1, K0)
    z += shiftMix(v._2) * K1
    x = cityRotate(z + x, 39) * K1
    y = cityRotate(y, 33) * K1

    var len = (n - 1) & ~63
    var off = 0
    while (len != 0) {
      x = cityRotate(x + y + v._1 + load64LE(bytes, off + 16), 37) * K1
      y = cityRotate(y + v._2 + load64LE(bytes, off + 48), 42) * K1
      x ^= w._2
      y ^= v._1
      z = cityRotate(z ^ w._1, 33)
      v = weakHash(bytes, off, v._2 * K1, x + w._1)
      w = weakHash(bytes, off + 32, z + w._2, y)
      val t = z; z = x; x = t
      off += 64
      len -= 64
    }
    hashLen16(
      hashLen16(v._1, w._1) + shiftMix(y) * K1 + z,
      hashLen16(v._2, w._2) + x)
  }

  // ---------- FarmHash 1.1 (farmHash64 / farmFingerprint64) ----------
  // Reference: FunctionsHashing.h:637-668 over contrib libfarmhash
  // (FarmHash 1.1, frozen). Fingerprint64 == farmhashna::Hash64 for every
  // length and is the upstream-documented STABLE variant. Hash64 is
  // build-dependent upstream: an SSE4.2 build (the reference's default)
  // routes through farmhashte, which equals the scalar farmhashxo for
  // inputs < 512 bytes and switches to a SIMD Hash64Long at >= 512 —
  // where even two reference builds (with/without -msse4.2) disagree.
  // This scalar implementation is farmhashxo: bit-exact with a stock
  // reference build for all inputs < 512 bytes; >= 512 it produces the
  // scalar-build value (pinned in HashCompatSpec with both facts).
  // Constants k0..k2 are CityHash's (K0..K2 above).

  @inline private def farmHashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= a >>> 47
    var b = (v ^ a) * mul
    b ^= b >>> 47
    b * mul
  }

  private def farmHashLen0to16(s: Array[Byte], off: Int, len: Int): Long = {
    if (len >= 8) {
      val mul = K2 + len * 2L
      val a = load64LE(s, off) + K2
      val b = load64LE(s, off + len - 8)
      val c = cityRotateAtLeast1(b, 37) * mul + a
      val d = (cityRotateAtLeast1(a, 25) + b) * mul
      farmHashLen16(c, d, mul)
    } else if (len >= 4) {
      val mul = K2 + len * 2L
      val a = load32LE(s, off) & 0xffffffffL
      farmHashLen16(len + (a << 3), load32LE(s, off + len - 4) & 0xffffffffL, mul)
    } else if (len > 0) {
      val a = s(off) & 0xff
      val b = s(off + (len >> 1)) & 0xff
      val c = s(off + len - 1) & 0xff
      val y = (a + (b << 8)) & 0xffffffffL
      val z = (len + (c << 2)) & 0xffffffffL
      shiftMix(y * K2 ^ z * K0) * K2
    } else K2
  }

  private def farmHashLen17to32(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = K2 + len * 2L
    val a = load64LE(s, off) * K1
    val b = load64LE(s, off + 8)
    val c = load64LE(s, off + len - 8) * mul
    val d = load64LE(s, off + len - 16) * K2
    farmHashLen16(
      cityRotateAtLeast1(a + b, 43) + cityRotateAtLeast1(c, 30) + d,
      a + cityRotateAtLeast1(b + K2, 18) + c, mul)
  }

  private def farmNaHashLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = K2 + len * 2L
    val a = load64LE(s, off) * K2
    val b = load64LE(s, off + 8)
    val c = load64LE(s, off + len - 8) * mul
    val d = load64LE(s, off + len - 16) * K2
    val y = cityRotateAtLeast1(a + b, 43) + cityRotateAtLeast1(c, 30) + d
    val z = farmHashLen16(y, a + cityRotateAtLeast1(b + K2, 18) + c, mul)
    val e = load64LE(s, off + 16) * mul
    val f = load64LE(s, off + 24)
    val g = (y + load64LE(s, off + len - 32)) * mul
    val h = (z + load64LE(s, off + len - 24)) * mul
    farmHashLen16(
      cityRotateAtLeast1(e + f, 43) + cityRotateAtLeast1(g, 30) + h,
      e + cityRotateAtLeast1(f + a, 18) + g, mul)
  }

  /** farmhashna::Hash64 — also Fingerprint64, the stable variant. */
  def farmFingerprint64(bytes: Array[Byte]): Long =
    farmNaHash64(bytes, 0, bytes.length)

  private def farmNaHash64(s: Array[Byte], off: Int, len: Int): Long = {
    val seed = 81L
    if (len <= 32) {
      if (len <= 16) return farmHashLen0to16(s, off, len)
      else return farmHashLen17to32(s, off, len)
    } else if (len <= 64) return farmNaHashLen33to64(s, off, len)

    var x = seed
    var y = seed * K1 + 113L
    var z = shiftMix(y * K2 + 113L) * K2
    var v = (0L, 0L)
    var w = (0L, 0L)
    x = x * K2 + load64LE(s, off)

    val endOff = off + ((len - 1) / 64) * 64
    val last64 = off + len - 64
    var p = off
    while (p != endOff) {
      x = cityRotateAtLeast1(x + y + v._1 + load64LE(s, p + 8), 37) * K1
      y = cityRotateAtLeast1(y + v._2 + load64LE(s, p + 48), 42) * K1
      x ^= w._2
      y += v._1 + load64LE(s, p + 40)
      z = cityRotateAtLeast1(z + w._1, 33) * K1
      v = weakHash(s, p, v._2 * K1, x + w._1)
      w = weakHash(s, p + 32, z + w._2, y + load64LE(s, p + 16))
      val t = z; z = x; x = t
      p += 64
    }
    val mul = K1 + ((z & 0xff) << 1)
    p = last64
    var w1 = w._1 + ((len - 1) & 63)
    var v1 = v._1 + w1
    w1 += v1
    x = cityRotateAtLeast1(x + y + v1 + load64LE(s, p + 8), 37) * mul
    y = cityRotateAtLeast1(y + v._2 + load64LE(s, p + 48), 42) * mul
    x ^= w._2 * 9L
    y += v1 * 9L + load64LE(s, p + 40)
    z = cityRotateAtLeast1(z + w1, 33) * mul
    val v2 = weakHash(s, p, v._2 * mul, x + w1)
    val w2 = weakHash(s, p + 32, z + w._2, y + load64LE(s, p + 16))
    val t = z; z = x; x = t
    farmHashLen16(
      farmHashLen16(v2._1, w2._1, mul) + shiftMix(y) * K0 + z,
      farmHashLen16(v2._2, w2._2, mul) + x, mul)
  }

  private def farmNaHash64WithSeeds(s: Array[Byte], off: Int, len: Int,
                                    seed0: Long, seed1: Long): Long =
    hashLen16(farmNaHash64(s, off, len) - seed0, seed1)

  @inline private def farmUoH(x: Long, y: Long, mul: Long, r: Int): Long = {
    var a = (x ^ y) * mul
    a ^= a >>> 47
    val b = (y ^ a) * mul
    cityRotateAtLeast1(b, r) * mul
  }

  private def farmUoHash64WithSeeds(s: Array[Byte], off: Int, len: Int,
                                    seed0: Long, seed1: Long): Long = {
    if (len <= 64) return farmNaHash64WithSeeds(s, off, len, seed0, seed1)
    var x = seed0
    var y = seed1 * K2 + 113L
    var z = shiftMix(y * K2) * K2
    var v1 = seed0; var v2 = seed1
    var w1 = 0L; var w2 = 0L
    var u = x - z
    x *= K2
    val mul = K2 + (u & 0x82L)

    val endOff = off + ((len - 1) / 64) * 64
    val last64 = off + len - 64
    var p = off
    while (p != endOff) {
      val a0 = load64LE(s, p)
      val a1 = load64LE(s, p + 8)
      val a2 = load64LE(s, p + 16)
      val a3 = load64LE(s, p + 24)
      val a4 = load64LE(s, p + 32)
      val a5 = load64LE(s, p + 40)
      val a6 = load64LE(s, p + 48)
      val a7 = load64LE(s, p + 56)
      x += a0 + a1
      y += a2
      z += a3
      v1 += a4
      v2 += a5 + a1
      w1 += a6
      w2 += a7

      x = cityRotateAtLeast1(x, 26)
      x *= 9L
      y = cityRotateAtLeast1(y, 29)
      z *= mul
      v1 = cityRotateAtLeast1(v1, 33)
      v2 = cityRotateAtLeast1(v2, 30)
      w1 ^= x
      w1 *= 9L
      z = cityRotateAtLeast1(z, 32)
      z += w2
      w2 += z
      z *= 9L
      val t0 = u; u = y; y = t0

      z += a0 + a6
      v1 += a2
      v2 += a3
      w1 += a4
      w2 += a5 + a6
      x += a1
      y += a7

      y += v1
      v1 += x - y
      v2 += w1
      w1 += v2
      w2 += x - y
      x += w2
      w2 = cityRotateAtLeast1(w2, 34)
      val t1 = u; u = z; z = t1
      p += 64
    }
    p = last64
    u *= 9L
    v2 = cityRotateAtLeast1(v2, 28)
    v1 = cityRotateAtLeast1(v1, 20)
    w1 += ((len - 1) & 63)
    u += y
    y += u
    x = cityRotateAtLeast1(y - x + v1 + load64LE(s, p + 8), 37) * mul
    y = cityRotateAtLeast1(y ^ v2 ^ load64LE(s, p + 48), 42) * mul
    x ^= w2 * 9L
    y += v1 + load64LE(s, p + 40)
    z = cityRotateAtLeast1(z + w1, 33) * mul
    val vv = weakHash(s, p, v2 * mul, x + w1)
    val ww = weakHash(s, p + 32, z + w2, y + load64LE(s, p + 16))
    farmUoH(
      farmHashLen16(vv._1 + x, ww._1 ^ y, mul) + z - u,
      farmUoH(vv._2 + y, ww._2 + z, K2, 30) ^ x,
      K2, 31)
  }

  private def farmXoH32(s: Array[Byte], off: Int, len: Int, mul: Long,
                        seed0: Long = 0L, seed1: Long = 0L): Long = {
    val a = load64LE(s, off) * K1
    val b = load64LE(s, off + 8)
    val c = load64LE(s, off + len - 8) * mul
    val d = load64LE(s, off + len - 16) * K2
    val u = cityRotateAtLeast1(a + b, 43) + cityRotateAtLeast1(c, 30) + d + seed0
    val v = a + cityRotateAtLeast1(b + K2, 18) + c + seed1
    val a2 = shiftMix((u ^ v) * mul)
    shiftMix((v ^ a2) * mul)
  }

  private def farmXoHashLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    val mul0 = K2 - 30L
    val mul1 = K2 - 30L + 2L * len
    val h0 = farmXoH32(s, off, 32, mul0)
    val h1 = farmXoH32(s, off + len - 32, 32, mul1)
    ((h1 * mul1) + h0) * mul1
  }

  private def farmXoHashLen65to96(s: Array[Byte], off: Int, len: Int): Long = {
    val mul0 = K2 - 114L
    val mul1 = K2 - 114L + 2L * len
    val h0 = farmXoH32(s, off, 32, mul0)
    val h1 = farmXoH32(s, off + 32, 32, mul1)
    val h2 = farmXoH32(s, off + len - 32, 32, mul1, h0, h1)
    (h2 * 9L + (h0 >>> 17) + (h1 >>> 21)) * mul1
  }

  /** farmhashxo::Hash64 — equals a stock (SSE4.2) reference build for all
    * inputs < 512 bytes; >= 512 pins the scalar-build value (see header). */
  def farmHash64(bytes: Array[Byte]): Long = {
    val len = bytes.length
    if (len <= 32) {
      if (len <= 16) farmHashLen0to16(bytes, 0, len)
      else farmHashLen17to32(bytes, 0, len)
    } else if (len <= 64) farmXoHashLen33to64(bytes, 0, len)
    else if (len <= 96) farmXoHashLen65to96(bytes, 0, len)
    else if (len <= 256) farmNaHash64(bytes, 0, len)
    else farmUoHash64WithSeeds(bytes, 0, len, 81L, 0L)
  }

  // ---------- metroHash64 (metrohash64_1, seed 0) ----------
  // Reference: FunctionsHashing.h:651-671 over contrib libmetrohash.

  def metroHash64(b: Array[Byte]): Long = {
    val k0 = 0xC83A91E1L; val k1 = 0x8648DBDBL
    val k2 = 0x7BDEC03BL; val k3 = 0x2F5870A5L
    val len = b.length
    var p = 0
    var hash = (0L + k2) * k0 + len
    if (len >= 32) {
      var v0 = hash; var v1 = hash; var v2 = hash; var v3 = hash
      while (len - p >= 32) {
        v0 += load64LE(b, p) * k0; p += 8; v0 = java.lang.Long.rotateRight(v0, 29) + v2
        v1 += load64LE(b, p) * k1; p += 8; v1 = java.lang.Long.rotateRight(v1, 29) + v3
        v2 += load64LE(b, p) * k2; p += 8; v2 = java.lang.Long.rotateRight(v2, 29) + v0
        v3 += load64LE(b, p) * k3; p += 8; v3 = java.lang.Long.rotateRight(v3, 29) + v1
      }
      v2 ^= java.lang.Long.rotateRight((v0 + v3) * k0 + v1, 33) * k1
      v3 ^= java.lang.Long.rotateRight((v1 + v2) * k1 + v0, 33) * k0
      v0 ^= java.lang.Long.rotateRight((v0 + v2) * k0 + v3, 33) * k1
      v1 ^= java.lang.Long.rotateRight((v1 + v3) * k1 + v2, 33) * k0
      hash += v0 ^ v1
    }
    if (len - p >= 16) {
      var v0 = hash + load64LE(b, p) * k0; p += 8
      v0 = java.lang.Long.rotateRight(v0, 33) * k1
      var v1 = hash + load64LE(b, p) * k1; p += 8
      v1 = java.lang.Long.rotateRight(v1, 33) * k2
      v0 ^= java.lang.Long.rotateRight(v0 * k0, 35) + v1
      v1 ^= java.lang.Long.rotateRight(v1 * k3, 35) + v0
      hash += v1
    }
    if (len - p >= 8) {
      hash += load64LE(b, p) * k3; p += 8
      hash ^= java.lang.Long.rotateRight(hash, 33) * k1
    }
    if (len - p >= 4) {
      hash += (load32LE(b, p) & 0xffffffffL) * k3; p += 4
      hash ^= java.lang.Long.rotateRight(hash, 15) * k1
    }
    if (len - p >= 2) {
      hash += ((b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8)) * k3; p += 2
      hash ^= java.lang.Long.rotateRight(hash, 13) * k1
    }
    if (len - p >= 1) {
      hash += (b(p) & 0xffL) * k3
      hash ^= java.lang.Long.rotateRight(hash, 25) * k1
    }
    hash ^= java.lang.Long.rotateRight(hash, 33)
    hash *= k0
    hash ^= java.lang.Long.rotateRight(hash, 33)
    hash
  }

  // ---------- xxHash32 / xxHash64 ----------

  def xxHash32(b: Array[Byte], seed: Int): Long = {
    val P1 = -1640531535 // 2654435761
    val P2 = -2048144777 // 2246822519
    val P3 = -1028477379 // 3266489917
    val P4 = 668265263
    val P5 = 374761393
    val len = b.length
    var i = 0
    var h = 0
    if (len >= 16) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = len - 16
      while (i <= limit) {
        v1 = rotl32(v1 + load32LE(b, i) * P2, 13) * P1
        v2 = rotl32(v2 + load32LE(b, i + 4) * P2, 13) * P1
        v3 = rotl32(v3 + load32LE(b, i + 8) * P2, 13) * P1
        v4 = rotl32(v4 + load32LE(b, i + 12) * P2, 13) * P1
        i += 16
      }
      h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18)
    } else h = seed + P5
    h += len
    while (i + 4 <= len) {
      h = rotl32(h + load32LE(b, i) * P3, 17) * P4
      i += 4
    }
    while (i < len) {
      h = rotl32(h + (b(i) & 0xff) * P5, 11) * P1
      i += 1
    }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h & 0xffffffffL
  }

  def xxHash32(b: Array[Byte]): Long = xxHash32(b, 0)

  def xxHash64(b: Array[Byte], seed: Long): Long = {
    val P1 = -7046029288634856825L // 11400714785074694791
    val P2 = -4417276706812531889L // 14029467366897019727
    val P3 = 1609587929392839161L
    val P4 = -8796714831421723037L // 9650029242287828579
    val P5 = 2870177450012600261L
    val len = b.length
    var i = 0
    var h = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = len - 32
      while (i <= limit) {
        v1 = rotl(v1 + load64LE(b, i) * P2, 31) * P1
        v2 = rotl(v2 + load64LE(b, i + 8) * P2, 31) * P1
        v3 = rotl(v3 + load64LE(b, i + 16) * P2, 31) * P1
        v4 = rotl(v4 + load64LE(b, i + 24) * P2, 31) * P1
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      v1 *= P2; v1 = rotl(v1, 31); v1 *= P1; h ^= v1; h = h * P1 + P4
      v2 *= P2; v2 = rotl(v2, 31); v2 *= P1; h ^= v2; h = h * P1 + P4
      v3 *= P2; v3 = rotl(v3, 31); v3 *= P1; h ^= v3; h = h * P1 + P4
      v4 *= P2; v4 = rotl(v4, 31); v4 *= P1; h ^= v4; h = h * P1 + P4
    } else h = seed + P5
    h += len
    while (i + 8 <= len) {
      var k = load64LE(b, i)
      k *= P2; k = rotl(k, 31); k *= P1
      h ^= k; h = rotl(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= (load32LE(b, i) & 0xffffffffL) * P1
      h = rotl(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (b(i) & 0xff) * P5
      h = rotl(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  def xxHash64(b: Array[Byte]): Long = xxHash64(b, 0L)

  // ---------- wyhash (final_version_3) ----------

  private val WYP0 = 0xa0761d6478bd642fL
  private val WYP1 = 0xe7037ed1a0b428dbL
  private val WYP2 = 0x8ebc6af09c88c6e3L
  private val WYP3 = 0x589965cc75374cc3L

  @inline private def wymum(a0: Long, b0: Long): Long = {
    // 128-bit multiply, xor-fold halves (wyhash _wymum with default config)
    // unsigned 128-bit high word from signed multiplyHigh (Java 17 has no unsignedMultiplyHigh)
    val hi = Math.multiplyHigh(a0, b0) + (((a0 >> 63) & b0) + ((b0 >> 63) & a0))
    val lo = a0 * b0
    lo ^ hi
  }

  @inline private def wyr8(b: Array[Byte], i: Int): Long = load64LE(b, i)
  @inline private def wyr4(b: Array[Byte], i: Int): Long = load32LE(b, i) & 0xffffffffL
  @inline private def wyr3(b: Array[Byte], i: Int, k: Int): Long =
    ((b(i) & 0xffL) << 16) | ((b(i + (k >> 1)) & 0xffL) << 8) | (b(i + k - 1) & 0xffL)

  /** wyhash(s, len, 0, _wyp) per wyhash_final_version_3. */
  def wyHash64(b: Array[Byte]): Long = {
    val len = b.length
    var seed = 0L ^ WYP0
    if (len <= 16) {
      if (len >= 4) {
        val a = (wyr4(b, 0) << 32) | wyr4(b, (len >> 3) << 2)
        val bb = (wyr4(b, len - 4) << 32) | wyr4(b, len - 4 - ((len >> 3) << 2))
        seed = wymum(WYP1 ^ len, wymum(a ^ WYP1, bb ^ seed))
      } else if (len > 0) {
        seed = wymum(WYP1 ^ len, wymum(wyr3(b, 0, len) ^ WYP1, seed))
      } else {
        seed = wymum(WYP1 ^ len, wymum(WYP1, seed))
      }
    } else {
      var i = len
      var off = 0
      if (i > 48) {
        var see1 = seed
        var see2 = seed
        while (i > 48) {
          seed = wymum(wyr8(b, off) ^ WYP1, wyr8(b, off + 8) ^ seed)
          see1 = wymum(wyr8(b, off + 16) ^ WYP2, wyr8(b, off + 24) ^ see1)
          see2 = wymum(wyr8(b, off + 32) ^ WYP3, wyr8(b, off + 40) ^ see2)
          off += 48
          i -= 48
        }
        seed ^= see1 ^ see2
      }
      while (i > 16) {
        seed = wymum(wyr8(b, off) ^ WYP1, wyr8(b, off + 8) ^ seed)
        off += 16
        i -= 16
      }
      seed = wymum(wyr8(b, off + i - 16) ^ WYP1, wyr8(b, off + i - 8) ^ seed)
      seed = wymum(WYP1 ^ len, seed)
    }
    seed
  }

  // ---------- halfMD5 ----------

  def halfMD5(b: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(b)
    // first 8 digest bytes as big-endian UInt64 (reference transformEndianness<big>)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  // ---------- CRC ----------

  private def crcTable(poly: Long): Array[Long] = {
    val tab = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var c = i.toLong
      var j = 0
      while (j < 8) { c = if ((c & 1L) != 0) poly ^ (c >>> 1) else c >>> 1; j += 1 }
      tab(i) = c
      i += 1
    }
    tab
  }

  private lazy val crc32IeeeTab = crcTable(0xedb88320L)
  private lazy val crc64EcmaTab = crcTable(0xc96c5795d7870f42L)

  /** CRC32IEEE: reflected IEEE poly, init 0, no final xor (CRC.cpp CRCImpl). */
  def crc32IEEE(b: Array[Byte]): Long = {
    var crc = 0L
    var i = 0
    while (i < b.length) {
      crc = crc32IeeeTab(((crc ^ b(i)) & 0xff).toInt) ^ (crc >>> 8)
      i += 1
    }
    crc & 0xffffffffL
  }

  /** CRC64 (ECMA poly, init 0, no final xor — CRC.cpp CRC64ECMAImpl). */
  def crc64(b: Array[Byte]): Long = {
    var crc = 0L
    var i = 0
    while (i < b.length) {
      crc = crc64EcmaTab(((crc ^ b(i)) & 0xff).toInt) ^ (crc >>> 8)
      i += 1
    }
    crc
  }

  /** CRC32 = zlib semantics (init ~0, final xor ~0) — java.util.zip.CRC32. */
  def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b)
    c.getValue
  }

  // ---------- combine (multi-arg fold, per reference combineHashesFunc) ----------

  /** cityHash64 combine: Hash128to64(h1, h2) (FunctionsHashing.h:621);
    * also the reference's combine for xxHash64 (:705), metroHash64 (:656)
    * and farmHash64 (:645). */
  def cityCombine(h1: Long, h2: Long): Long = hash128to64(h1, h2)

  /** Generic combine for sip/wy/halfMD5: hash of the two LE words
    * (combineHashesFunc, FunctionsHashing.h:193-199). */
  def sipCombine(h1: Long, h2: Long): Long = sipHash64(le8(h1) ++ le8(h2))
  def wy64Combine(h1: Long, h2: Long): Long = wyHash64(le8(h1) ++ le8(h2))
  def halfMD5Combine(h1: Long, h2: Long): Long = halfMD5(le8(h1) ++ le8(h2))
  /** murmur2_64 / gccMurmur / murmur3_64 combine (FunctionsHashing.h:400,419,489). */
  def murmur2_64Combine(h1: Long, h2: Long): Long = intHash64(h1) ^ h2
  /** 32-bit-space combine: murmur2_32/kafka/murmur3_32/xxHash32
    * (FunctionsHashing.h:382,441,465,688). */
  def int32XorCombine(h1: Long, h2: Long): Long = (intHash32(h1) ^ h2) & 0xffffffffL
  def xx64Combine(h1: Long, h2: Long): Long = xxHash64(le8(h1) ++ le8(h2))

  // ---------- POD (non-string) inputs ----------

  /** LE bytes of a value at the given byte width. The reference hashes a
    * numeric column's native little-endian layout at its own width
    * (FunctionsHashing.h:904-910 — apply(reinterpret_cast, sizeof)); used
    * by the hash expressions for numeric/date/bool children. */
  def leBytesW(x: Long, width: Int): Array[Byte] = {
    val b = new Array[Byte](width)
    var i = 0
    while (i < width) { b(i) = ((x >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }
}

/** Shared input handling for the ChHash* expressions. Strings hash their
  * UTF-8 bytes and binaries their raw bytes; numeric/bool/date children
  * hash the value's native little-endian byte layout at its own width,
  * matching the reference's POD path (FunctionsHashing.h:904-910:
  * apply(reinterpret_cast<const char*>(&v), sizeof(v))). Widths follow
  * the reference column types: Date = UInt16 days (2), Timestamp =
  * DateTime64(6) Int64 micros (8), Float32/64 = raw IEEE bits at 4/8.
  * Unsupported types fail at analysis time, not with a runtime
  * MatchError. */
private[functions] object HashInput {
  val supported: Set[DataType] = Set(
    StringType, BinaryType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, BooleanType, DateType, TimestampType,
    TimestampNTZType)

  def check(dt: DataType, name: String): TypeCheckResult =
    if (supported(dt)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name does not support ${dt.sql} input; cast to string/binary or a numeric type")

  /** Eval-path bytes for a non-null input of declared type dt. */
  def bytes(input: Any, dt: DataType): Array[Byte] = dt match {
    case StringType => input.asInstanceOf[UTF8String].getBytes
    case BinaryType => input.asInstanceOf[Array[Byte]]
    case ByteType => HashCompat.leBytesW(input.asInstanceOf[Byte].toLong, 1)
    case ShortType => HashCompat.leBytesW(input.asInstanceOf[Short].toLong, 2)
    case IntegerType => HashCompat.leBytesW(input.asInstanceOf[Int].toLong, 4)
    case LongType => HashCompat.leBytesW(input.asInstanceOf[Long], 8)
    case BooleanType =>
      HashCompat.leBytesW(if (input.asInstanceOf[Boolean]) 1L else 0L, 1)
    case DateType => HashCompat.leBytesW(input.asInstanceOf[Int].toLong, 2)
    case TimestampType | TimestampNTZType =>
      HashCompat.leBytesW(input.asInstanceOf[Long], 8)
    case FloatType => HashCompat.leBytesW(
      java.lang.Float.floatToRawIntBits(input.asInstanceOf[Float]).toLong & 0xffffffffL, 4)
    case DoubleType => HashCompat.leBytesW(
      java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double]), 8)
  }

  /** Codegen fragment producing byte[] from the child's value variable. */
  def genBytes(a: String, dt: DataType): String = dt match {
    case StringType => s"$a.getBytes()"
    case BinaryType => a
    case ByteType => s"graft.functions.HashCompat.leBytesW((long)$a, 1)"
    case ShortType => s"graft.functions.HashCompat.leBytesW((long)$a, 2)"
    case IntegerType => s"graft.functions.HashCompat.leBytesW((long)$a, 4)"
    case LongType => s"graft.functions.HashCompat.leBytesW($a, 8)"
    case BooleanType => s"graft.functions.HashCompat.leBytesW($a ? 1L : 0L, 1)"
    case DateType => s"graft.functions.HashCompat.leBytesW((long)$a, 2)"
    case TimestampType | TimestampNTZType =>
      s"graft.functions.HashCompat.leBytesW($a, 8)"
    case FloatType =>
      s"graft.functions.HashCompat.leBytesW(((long)Float.floatToRawIntBits($a)) & 0xffffffffL, 4)"
    case DoubleType =>
      s"graft.functions.HashCompat.leBytesW(Double.doubleToRawLongBits($a), 8)"
  }
}

/** Unary byte-hash returning Long: algo is a static-method name on
  * HashCompat, dispatched by generated code directly (stays inside
  * whole-stage codegen). */
case class ChHash64(child: Expression, algo: String) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    HashInput.check(child.dataType, algo)
  override def nullSafeEval(input: Any): Any =
    ChHash64.invoke(algo, HashInput.bytes(input, child.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashCompat.$algo(${HashInput.genBytes(a, child.dataType)});")
  override protected def withNewChildInternal(newChild: Expression): ChHash64 =
    copy(child = newChild)
}

object ChHash64 {
  def invoke(algo: String, b: Array[Byte]): Long = algo match {
    case "sipHash64" => HashCompat.sipHash64(b)
    case "cityHash64" => HashCompat.cityHash64(b)
    case "murmurHash2_32u" => HashCompat.murmurHash2_32u(b)
    case "murmurHash2_64" => HashCompat.murmurHash2_64(b)
    case "gccMurmurHash" => HashCompat.gccMurmurHash(b)
    case "kafkaMurmurHash" => HashCompat.kafkaMurmurHash(b)
    case "murmurHash3_32" => HashCompat.murmurHash3_32(b)
    case "murmurHash3_64" => HashCompat.murmurHash3_64(b)
    case "xxHash32" => HashCompat.xxHash32(b)
    case "xxHash64" => HashCompat.xxHash64(b)
    case "wyHash64" => HashCompat.wyHash64(b)
    case "farmHash64" => HashCompat.farmHash64(b)
    case "farmFingerprint64" => HashCompat.farmFingerprint64(b)
    case "metroHash64" => HashCompat.metroHash64(b)
    case "halfMD5" => HashCompat.halfMD5(b)
    case "crc32" => HashCompat.crc32(b)
    case "crc32IEEE" => HashCompat.crc32IEEE(b)
    case "crc64" => HashCompat.crc64(b)
  }
}

/** Unary byte-hash returning Int (javaHash family — reference Int32). */
case class ChHash32(child: Expression, algo: String) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    HashInput.check(child.dataType, algo)
  override def nullSafeEval(input: Any): Any = {
    val b = HashInput.bytes(input, child.dataType)
    algo match {
      case "javaHash" => HashCompat.javaHash(b)
      case "javaHashUTF16LE" => HashCompat.javaHashUTF16LE(b)
      case "hiveHash" => HashCompat.hiveHash(b)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashCompat.$algo(${HashInput.genBytes(a, child.dataType)});")
  override protected def withNewChildInternal(newChild: Expression): ChHash32 =
    copy(child = newChild)
}

/** Unary byte-hash returning 16-byte binary (sipHash128 family,
  * murmurHash3_128) in the reference's memory order. */
case class ChHash128(child: Expression, algo: String) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    HashInput.check(child.dataType, algo)
  override def nullSafeEval(input: Any): Any = {
    val b = HashInput.bytes(input, child.dataType)
    algo match {
      case "sipHash128" => HashCompat.sipHash128(b)
      case "sipHash128Reference" => HashCompat.sipHash128Reference(b)
      case "murmurHash3_128" => HashCompat.murmurHash3_128(b)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashCompat.$algo(${HashInput.genBytes(a, child.dataType)});")
  override protected def withNewChildInternal(newChild: Expression): ChHash128 =
    copy(child = newChild)
}

/** 128-bit two-hash combine (combineHashesFunc<UInt128> —
  * FunctionsHashing.h:193-199,290,325,507): the two 16-byte LE states are
  * concatenated and re-hashed with the same algorithm. Lets multi-arg
  * sipHash128(a, b, …) fold like the reference instead of dropping
  * arguments. */
case class Ch128Combine(left: Expression, right: Expression, algo: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, r: Any): Any =
    Ch128Combine.invoke(algo, l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""${ev.value} = graft.functions.Ch128Combine.invoke("$algo", $l, $r);""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Ch128Combine =
    copy(left = l, right = r)
}

object Ch128Combine {
  def invoke(algo: String, a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val cat = new Array[Byte](a.length + b.length)
    System.arraycopy(a, 0, cat, 0, a.length)
    System.arraycopy(b, 0, cat, a.length, b.length)
    algo match {
      case "sipHash128" => HashCompat.sipHash128(cat)
      case "sipHash128Reference" => HashCompat.sipHash128Reference(cat)
      case "murmurHash3_128" => HashCompat.murmurHash3_128(cat)
    }
  }
}

/** Two-hash combine for multi-argument hash calls, per the reference's
  * per-function combineHashes (city: Hash128to64; sip: hash of the two LE
  * words; murmur2_64: intHash64(h1)^h2 — FunctionsHashing.h). Multi-arg
  * calls fold left over per-argument hashes with this. */
case class ChHashCombine(left: Expression, right: Expression, algo: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private val method = ChHashCombine.methodFor(algo)
  override def dataType: DataType = LongType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val h1 = l.asInstanceOf[Long]
    val h2 = r.asInstanceOf[Long]
    method match {
      case "cityCombine" => HashCompat.cityCombine(h1, h2)
      case "sipCombine" => HashCompat.sipCombine(h1, h2)
      case "murmur2_64Combine" => HashCompat.murmur2_64Combine(h1, h2)
      case "int32XorCombine" => HashCompat.int32XorCombine(h1, h2)
      case "wy64Combine" => HashCompat.wy64Combine(h1, h2)
      case "halfMD5Combine" => HashCompat.halfMD5Combine(h1, h2)
      case "xx64Combine" => HashCompat.xx64Combine(h1, h2)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.HashCompat.$method($l, $r);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ChHashCombine =
    copy(left = l, right = r)
}

object ChHashCombine {
  /** Per-algorithm combine from the reference (FunctionsHashing.h line in
    * each combine method's doc). Algos absent here (javaHash family, CRC)
    * throw NOT_IMPLEMENTED in the reference for multi-arg calls too. */
  def methodFor(algo: String): String = algo match {
    // farmhash defines Fingerprint(uint128) == Hash128to64, so
    // farmFingerprint64's combine is also cityCombine (farmhash.h)
    case "cityHash64" | "xxHash64" | "metroHash64" | "farmHash64" |
         "farmFingerprint64" => "cityCombine"
    case "sipHash64" => "sipCombine"
    case "murmurHash2_64" | "gccMurmurHash" | "murmurHash3_64" => "murmur2_64Combine"
    case "murmurHash2_32u" | "kafkaMurmurHash" | "murmurHash3_32" |
         "xxHash32" => "int32XorCombine"
    case "wyHash64" => "wy64Combine"
    case "halfMD5" => "halfMD5Combine"
  }
  def combinable(algo: String): Boolean =
    try { methodFor(algo); true } catch { case _: MatchError => false }
}

/** intHash32/intHash64 over an integer input (Long-typed). */
case class ChIntHash(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    if (bits == 32) HashCompat.intHash32(x) else HashCompat.intHash64(x)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashCompat.intHash${bits}($a);")
  override protected def withNewChildInternal(newChild: Expression): ChIntHash =
    copy(child = newChild)
}
