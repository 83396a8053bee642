package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop numeric kernels over array columns (reference:
  * src/Functions/array/arrayDistance.cpp:702 L1/L2/cosine kernels,
  * arrayDotProduct.cpp — vectorized C++ there, single-pass typed loops
  * here).
  *
  * These exist for performance: the equivalent higher-order-function
  * compositions (zip_with + aggregate lambdas) evaluate an interpreted
  * lambda per element per row; on quadratic pair joins that interpreter
  * overhead dominates the query. Each kernel below is one virtual call
  * per ROW with a primitive loop inside — 10-40x faster in the pair-join
  * benchmarks. Accumulation order is identical to the sequential fold
  * (element 0..n-1 in double), so results are bit-equal to the
  * higher-order formulation and the DuckDB oracle.
  */
object VectorKernels {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  private def toDouble(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case _ => throw new IllegalArgumentException(s"unsupported element type $et")
  }

  // Element-type tags for the static codegen entry points (a generated
  // call site can't pattern-match on DataType).
  private def typeTag(et: DataType): Int = et match {
    case FloatType => 0
    case DoubleType => 1
    case LongType => 2
    case IntegerType => 3
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }
  private def get(arr: ArrayData, i: Int, tag: Int): Double = tag match {
    case 0 => arr.getFloat(i).toDouble
    case 1 => arr.getDouble(i)
    case 2 => arr.getLong(i).toDouble
    case _ => arr.getInt(i).toDouble
  }

  private def requireSameLength(a: ArrayData, b: ArrayData): Int = {
    val (na, nb) = (a.numElements(), b.numElements())
    if (na != nb)
      throw new IllegalArgumentException(
        s"vector kernel: mismatched array lengths $na vs $nb")
    na
  }

  /** Static entry points — called from BOTH the interpreted eval and the
    * generated code, so whole-stage codegen stays unbroken in the
    * quadratic pair loops and results are identical by construction
    * (same sequential fold in double). */
  def dotEval(a: ArrayData, b: ArrayData, ta: Int, tb: Int): Double = {
    val n = requireSameLength(a, b)
    var dot = 0.0; var i = 0
    while (i < n) { dot += get(a, i, ta) * get(b, i, tb); i += 1 }
    dot
  }

  def cosineEval(a: ArrayData, b: ArrayData, ta: Int, tb: Int): Double = {
    val n = requireSameLength(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, ta); val y = get(b, i, tb)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def jaccardSortedEval(a: ArrayData, b: ArrayData): Double = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1 else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def intersectCountSortedEval(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1 else j += 1
    }
    inter
  }

  def jaccardStringsEval(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { sa.add(a.getUTF8String(i).toString); i += 1 }
    val sb = new java.util.HashSet[String](b.numElements() * 2)
    var inter = 0; var j = 0
    while (j < b.numElements()) {
      val s = b.getUTF8String(j).toString
      if (sb.add(s) && sa.contains(s)) inter += 1
      j += 1
    }
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def minhashSigEval(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h0 = Fnv64.hash(arr.getUTF8String(i).getBytes)
      var p = 0
      while (p < k) {
        // distinct odd multiplier + offset per permutation
        val h = h0 * (2L * p + 0x9e3779b97f4a7c15L) + (p * 0xc2b2ae3d27d4eb4fL)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhashTokensSigEval(arr: ArrayData, n: Int, k: Int): ArrayData = {
    val m = arr.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = Fnv64.hash(arr.getUTF8String(i).getBytes); i += 1 }
    val mins = Array.fill(k)(Long.MaxValue)
    val nWindows = math.max(m - n + 1, if (m > 0) 1 else 0)
    var w = 0
    while (w < nWindows) {
      var h0 = th(w)
      var j = 1
      while (j < n && w + j < m) { h0 = h0 * Fnv64.PRIME ^ th(w + j); j += 1 }
      var p = 0
      while (p < k) {
        val h = h0 * (2L * p + 0x9e3779b97f4a7c15L) + (p * 0xc2b2ae3d27d4eb4fL)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  def charNgramHashesEval(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val m = bytes.length
    val out =
      if (m <= n) Array(Fnv64.hash(bytes))
      else {
        val hs = new Array[Long](m - n + 1)
        var i = 0
        while (i <= m - n) {
          var h = Fnv64.OFFSET
          var j = i
          while (j < i + n) { h ^= (bytes(j) & 0xffL); h *= Fnv64.PRIME; j += 1 }
          hs(i) = h
          i += 1
        }
        java.util.Arrays.sort(hs)
        // dedup in place
        var w = 0; var r = 0
        while (r < hs.length) {
          if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
          r += 1
        }
        java.util.Arrays.copyOf(hs, w)
      }
    new GenericArrayData(out)
  }

  /** Hyperplane components: a deterministic splitmix64 of (plane, dim)
    * mapped to [-1, 1) — no RNG, reproducible across runs and engines. */
  private def planeComp(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 131071L + dim.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (java.lang.Math.floorMod(z, 2000001L) - 1000000L) / 1000000.0
  }

  // Memoized per (bands, planesPerBand, nDims) — shared by every task in
  // the executor JVM, so the O(planes * dims) tabulation happens once.
  private val planesCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()
  private def planes(bands: Int, planesPerBand: Int, nDims: Int): Array[Array[Double]] =
    planesCache.computeIfAbsent(
      (bands.toLong << 42) | (planesPerBand.toLong << 21) | nDims.toLong,
      _ => Array.tabulate(bands * planesPerBand, nDims)((pl, d) => planeComp(pl, d)))

  def hyperplaneBandSigsEval(arr: ArrayData, tag: Int, bands: Int, planesPerBand: Int): ArrayData = {
    val n = arr.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = get(arr, i, tag); i += 1 }
    val pl = planes(bands, planesPerBand, n)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bits = 0L; var p = 0
      while (p < planesPerBand) {
        val row = pl(b * planesPerBand + p)
        var d = 0.0; var j = 0
        while (j < n) { d += x(j) * row(j); j += 1 }
        if (d > 0) bits |= (1L << p)
        p += 1
      }
      out(b) = bits; b += 1
    }
    new GenericArrayData(out)
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** cosine(a, b) = dot / (|a| * |b|), one pass. Codegen calls the
    * static kernel directly, so whole-stage codegen is never broken. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      cosineEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
        typeTag(elemType(left)), typeTag(elemType(right)))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorKernels.cosineEval($a, $b, " +
          s"${typeTag(elemType(left))}, ${typeTag(elemType(right))});")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** dot(a, b), one pass in double — codegen via the static kernel. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      dotEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
        typeTag(elemType(left)), typeTag(elemType(right)))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorKernels.dotEval($a, $b, " +
          s"${typeTag(elemType(left))}, ${typeTag(elemType(right))});")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** Exact Jaccard similarity of two string arrays (treated as sets). */
  case class JaccardSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      jaccardStringsEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorKernels.jaccardStringsEval($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** k-permutation MinHash signature in ONE pass over the shingles:
    * base hash h0 = FNV-1a(shingle), family h_i = h0 * A_i + B_i with
    * odd multipliers derived from i (standard affine rehash family —
    * cf. one-permutation hashing literature). Returns array<long>. */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      minhashSigEval(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.minhashSigEval($a, $k);")
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** MinHash signature over word n-gram shingles computed DIRECTLY from
    * the token array — no shingle strings are ever materialized. Each
    * token is FNV-hashed once; an n-gram hash is an order-sensitive mix
    * of n consecutive token hashes; the k-permutation family is the same
    * affine rehash as MinHashSig. Duplicate shingles don't affect a min,
    * so no distinct pass is needed. This is the map-side cost of LSH
    * dedup — at corpus scale it's the dominant term, hence the kernel. */
  case class MinHashTokensSig(child: Expression, n: Int, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      minhashTokensSigEval(input.asInstanceOf[ArrayData], n, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.minhashTokensSigEval($a, $n, $k);")
    override protected def withNewChildInternal(c: Expression): MinHashTokensSig = copy(child = c)
  }

  /** Random-hyperplane band signatures for cosine LSH (banded like
    * MinHash-LSH: `bands` independent buckets, each the sign pattern of
    * `planesPerBand` hyperplane dots). Near-parallel vectors agree on all
    * signs of some band with high probability, so joining on
    * (band, signature) generates near-dup candidate pairs WITHOUT an
    * all-pairs join. Plane components are a deterministic splitmix64 of
    * (plane, dim) mapped to [-1, 1) — no RNG, reproducible across runs.
    * One pass per row; components are memoized per dimension count. */
  case class HyperplaneBandSigs(child: Expression, bands: Int, planesPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      hyperplaneBandSigsEval(input.asInstanceOf[ArrayData],
        typeTag(elemType(child)), bands, planesPerBand)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.hyperplaneBandSigsEval($a, " +
          s"${typeTag(elemType(child))}, $bands, $planesPerBand);")
    override protected def withNewChildInternal(c: Expression): HyperplaneBandSigs = copy(child = c)
  }

  /** Sorted distinct FNV-1a hashes of the character n-grams of a string —
    * reduces a document to a compact numeric set ONCE, so quadratic
    * pair-verification never touches strings. */
  case class CharNgramHashes(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      charNgramHashesEval(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.charNgramHashesEval($a, $n);")
    override protected def withNewChildInternal(c: Expression): CharNgramHashes = copy(child = c)
  }

  /** Exact |A ∩ B| of two SORTED distinct long arrays via linear merge —
    * integer result so downstream similarity ratios can be computed with
    * identical operands on any engine (no float fold-order hazards). */
  case class IntersectCountSortedLongs(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any =
      intersectCountSortedEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorKernels.intersectCountSortedEval($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** Jaccard of two SORTED distinct long arrays via linear merge —
    * codegen via the static kernel. */
  case class JaccardSortedLongs(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      jaccardSortedEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorKernels.jaccardSortedEval($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  def cosine_sim(a: Column, b: Column): Column = column(CosineSim(expression(a), expression(b)))
  def dot_product(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def jaccard_sim(a: Column, b: Column): Column = column(JaccardSim(expression(a), expression(b)))
  def minhash_sig(shingles: Column, k: Int): Column = column(MinHashSig(expression(shingles), k))
  def minhash_tokens_sig(tokens: Column, n: Int, k: Int): Column =
    column(MinHashTokensSig(expression(tokens), n, k))
  def char_ngram_hashes(text: Column, n: Int): Column =
    column(CharNgramHashes(expression(text), n))
  def jaccard_sorted_longs(a: Column, b: Column): Column =
    column(JaccardSortedLongs(expression(a), expression(b)))
  def intersect_count_sorted_longs(a: Column, b: Column): Column =
    column(IntersectCountSortedLongs(expression(a), expression(b)))
  def hyperplane_band_sigs(vec: Column, bands: Int, planesPerBand: Int): Column =
    column(HyperplaneBandSigs(expression(vec), bands, planesPerBand))
}
