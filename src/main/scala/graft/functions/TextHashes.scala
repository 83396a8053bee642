package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit FNV-1a hash — self-contained so sketch values are
  * stable across Spark versions (no dependence on internal hash impls). */
object Fnv64 {
  final val OFFSET = 0xcbf29ce484222325L
  final val PRIME = 0x100000001b3L
  def hash(bytes: Array[Byte], seed: Long = OFFSET): Long = {
    var h = seed
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= PRIME; i += 1 }
    h
  }
  def hashString(s: String, seed: Long = OFFSET): Long =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)
}

/** simHash64 over a token array (reference: FunctionsStringHash.cpp
  * wordShingleSimHash family — SimHash per Charikar, "Similarity
  * estimation techniques from rounding algorithms", STOC 2002).
  *
  * Each token votes ±1 on each of 64 bits of its hash; the result sets
  * bit j iff the vote sum is positive. Near-duplicate texts differ in few
  * bits (compare with hamming distance / bitXor+bit_count).
  *
  * Evaluated per-row over the token array — O(tokens * 64) with no state,
  * so it runs map-side anywhere in the plan. Codegen calls the static
  * kernel in TextHashes, so whole-stage codegen is never broken.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.simHash64Eval(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.simHash64Eval($a);")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
}

/** Polynomial rolling-hash fingerprint of a string (reference:
  * document fingerprinting à la Rabin-Karp; normalizes nothing — callers
  * lower/strip first if wanted). h = h*1315423911 xor c, over UTF-8 bytes. */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.rollingHash64Eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.rollingHash64Eval($a);")
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 = copy(newChild)
}

/** All contiguous token n-grams of a token array, space-joined — the
  * span unit of exact-substring dedup (Lee et al. 2021). The equivalent
  * transform(sequence, i -> array_join(slice(...)))) composition runs an
  * interpreted lambda per POSITION (HigherOrderFunction = CodegenFallback);
  * this kernel is one virtual call per ROW with a byte-copy loop inside —
  * ~10x less CPU on gram-heavy corpora. Returns [] when tokens < n. */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.tokenNgramsEval(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.tokenNgramsEval($a, $n);")
  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

/** sparseGrams (reference src/Functions/sparseGrams.cpp): all substrings
  * of minimal length n whose border (n-1)-gram hashes strictly dominate
  * every interior (n-1)-gram hash — a content-defined, shift-invariant
  * substring sample (the anchor set used for fuzzy text indexing). The
  * reference hashes with its internal weak crc32; ours uses the engine's
  * FNV-1a so values stay self-contained — the SELECTION ALGORITHM is the
  * same, the sampled set differs by hash choice (documented; pinned by
  * golden + property tests, not a cross-engine oracle). Bounded by the
  * same max substring length 100 as the reference. */
case class SparseGrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.sparseGramsEval(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.sparseGramsEval($a, $n);")
  override protected def withNewChildInternal(c: Expression): SparseGrams =
    copy(child = c)
}

object TextHashes {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  private val SPACE = UTF8String.fromString(" ")

  private final val MaxSparseGramLen = 100

  def sparseGramsEval(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val k = n - 1
    if (k < 1 || str.length < n) return new GenericArrayData(Array.empty[Any])
    val nGrams = str.length - k + 1
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { h(i) = Fnv64.hashString(str.substring(i, i + k)); i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < nGrams) {
      // walk right borders while the interior max stays below BOTH
      // borders; stop once an interior gram reaches h(i) (no later right
      // border can dominate it) or the length bound is hit
      var maxInterior = Long.MinValue
      var j = i + 1
      var go = true
      while (go && j < nGrams && (j + k - i) <= MaxSparseGramLen) {
        if (h(i) > maxInterior && h(j) > maxInterior)
          out += UTF8String.fromString(str.substring(i, j + k))
        if (h(j) >= h(i)) go = false
        else { if (h(j) > maxInterior) maxInterior = h(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def tokenNgramsEval(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    val slice = new Array[UTF8String](n)
    i = 0
    while (i <= m - n) {
      System.arraycopy(toks, i, slice, 0, n)
      out(i) = UTF8String.concatWs(SPACE, slice: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Static entry points shared by interpreted eval and generated code. */
  def simHash64Eval(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Fnv64.hashString(arr.getUTF8String(i).toString)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def rollingHash64Eval(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 1315423911L ^ (bytes(i) & 0xffL); i += 1 }
    h
  }
  def sim_hash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def rolling_hash64(text: Column): Column = column(RollingHash64(expression(text)))
  def token_ngrams(tokens: Column, n: Int): Column =
    column(TokenNgrams(expression(tokens), n))
  def sparse_grams(text: Column, n: Int = 3): Column =
    column(SparseGrams(expression(text), n))

  /** bitHammingDistance (reference bitHammingDistance.cpp) composed from
    * built-ins: popcount(a xor b). */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
}
