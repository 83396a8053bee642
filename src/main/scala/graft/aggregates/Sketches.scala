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

  private def hash64(x: Long): Long = {
    // splitmix64 — avalanches the raw value into a uniform 64-bit hash
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

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
