package graft.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** uniqTheta-style distinct sketch (reference:
  * src/AggregateFunctions/AggregateFunctionUniq.h:74 — theta/KMV family;
  * published algorithm: Bar-Yossef et al., "Counting distinct elements in
  * a data stream", RANDOM 2002 — the k-minimum-values estimator).
  *
  * Buffer = the k smallest distinct 64-bit hashes seen, kept as a sorted
  * array (k longs shuffle per group — the partial-aggregation shape Spark
  * expects). Estimate = (k-1) / θ where θ is the k-th minimum normalized
  * to [0,1); if fewer than k distinct hashes arrived the count is exact.
  * Deterministic: same input set ⇒ same hashes ⇒ same estimate, which is
  * what lets the correctness gate pin its accuracy contract.
  */
class KmvDistinctAggregator(k: Int = 1024)
    extends Aggregator[Long, Array[Long], Long] {

  private def hash64(x: Long): Long = KmvDistinctAggregator.hash64(x)

  def zero: Array[Long] = Array.empty

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    if (buf.length < k) {
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (ins < k) {
      val out = new Array[Long](k)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
      out
    } else buf
  }

  def reduce(b: Array[Long], v: Long): Array[Long] = insert(b, hash64(v))

  def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  def finish(b: Array[Long]): Long =
    if (b.length < k) b.length.toLong
    else {
      // map signed hash space onto [0,1): shift by Long.MinValue
      val theta = (b(k - 1).toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1) / theta)
    }

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object KmvDistinctAggregator {
  /** splitmix64 — avalanches the raw value into a uniform 64-bit hash.
    * Shared with initializeAggregation('uniqThetaState', x) so a
    * singleton state merges correctly with aggregated states. */
  def hash64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** uniqTheta set algebra (reference src/Functions/UniqTheta/
  * FunctionsUniqTheta.cpp — uniqThetaUnion/Intersect/Not over theta
  * sketch states; the reference wraps the DataSketches ops, here the
  * same estimator algebra runs over our KMV state from
  * KmvDistinctAggregator / the uniq_theta_state udaf):
  *  - theta(sketch) = 1 when unsaturated, else the k-th smallest hash as
  *    a fraction of the hash space;
  *  - union: cap-k merge of the two sorted buffers (a new valid state);
  *  - intersect/not: count surviving hashes below min(thetaA, thetaB),
  *    scaled by 1/theta.
  * Counts are EXACT whenever both sketches are unsaturated (< k distinct
  * values) — the oracle query exploits that. */
object ThetaSetOps {
  final val K = 1024

  private def frac(h: Long): Double =
    (h.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  def thetaOf(b: Array[Long]): Double =
    if (b.length < K) 1.0 else frac(b(b.length - 1))

  /** Cap-k sorted distinct merge — a valid KMV state for composition. */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val merged = (a ++ b).distinct
    java.util.Arrays.sort(merged)
    if (merged.length <= K) merged else java.util.Arrays.copyOf(merged, K)
  }

  def unionCount(a: Array[Long], b: Array[Long]): Long = estimate(union(a, b))

  def intersectCount(a: Array[Long], b: Array[Long]): Long = {
    val theta = math.min(thetaOf(a), thetaOf(b))
    val bs = b.toSet
    val n = a.count(h => bs.contains(h) && (theta == 1.0 || frac(h) < theta))
    if (theta == 1.0) n.toLong else math.round(n / theta)
  }

  def notCount(a: Array[Long], b: Array[Long]): Long = {
    val theta = math.min(thetaOf(a), thetaOf(b))
    val bs = b.toSet
    val n = a.count(h => !bs.contains(h) && (theta == 1.0 || frac(h) < theta))
    if (theta == 1.0) n.toLong else math.round(n / theta)
  }

  def estimate(b: Array[Long]): Long =
    if (b.length < K) b.length.toLong
    else math.round((K - 1) / frac(b(K - 1)))
}

/** -State form of uniq_theta: the raw KMV buffer as array<bigint>, for
  * the theta set-op functions (uniqThetaState analog). */
/** -Merge half of uniq[Theta]State (reference AggregateFunctionMerge.h):
  * unions KMV state buffers produced by uniq_theta_state and finalizes
  * to the distinct estimate — the two-level aggregation contract. */
class KmvMergeAggregator(k: Int = ThetaSetOps.K)
    extends Aggregator[Array[Long], Array[Long], Long] {
  private val inner = new KmvDistinctAggregator(k)
  def zero: Array[Long] = inner.zero
  def reduce(b: Array[Long], st: Array[Long]): Array[Long] =
    inner.merge(b, if (st == null) Array.empty else st)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  def finish(b: Array[Long]): Long = inner.finish(b)
  def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
  def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
}

/** -MergeState half (reference AggregateFunctionMergeState): unions KMV
  * state buffers WITHOUT finalizing — the result is still a state that
  * finalizeAggregation/uniqMerge can consume. */
class KmvMergeStateAggregator(k: Int = ThetaSetOps.K)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  private val inner = new KmvDistinctAggregator(k)
  def zero: Array[Long] = inner.zero
  def reduce(b: Array[Long], st: Array[Long]): Array[Long] =
    inner.merge(b, if (st == null) Array.empty else st)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

class KmvStateAggregator(k: Int = ThetaSetOps.K)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private val inner = new KmvDistinctAggregator(k)
  def zero: Array[Long] = inner.zero
  def reduce(b: Array[Long], v: Long): Array[Long] = inner.reduce(b, v)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
