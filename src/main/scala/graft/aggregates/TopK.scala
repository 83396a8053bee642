package graft.aggregates

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** topK / heavy hitters via the SpaceSaving sketch (reference:
  * src/AggregateFunctions/AggregateFunctionTopK.cpp:50 — SpaceSaving with
  * reserved capacity; published algorithm: Metwally, Agrawal, El Abbadi,
  * "Efficient Computation of Frequent and Top-k Elements in Data Streams",
  * ICDT 2005).
  *
  * Buffer is a bounded counter map (capacity = loadFactor*k): when full,
  * an incoming unseen value replaces the minimum counter and inherits its
  * count as error bound. Counts are EXACT whenever the number of distinct
  * values seen by a buffer stays under capacity. merge() sums counters
  * then re-prunes — the standard distributed SpaceSaving merge, which
  * keeps the partial-aggregation (map-side combine) property Spark's
  * hash aggregation expects: each partition builds a small sketch, the
  * shuffle moves only k*loadFactor counters per group.
  */
class TopKAggregator(k: Int, loadFactor: Int = 10)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {
  private val capacity = k * loadFactor

  def zero: mutable.Map[String, Long] = mutable.Map.empty

  def reduce(b: mutable.Map[String, Long], v: String): mutable.Map[String, Long] = {
    if (v != null) add(b, v, 1L)
    b
  }

  private def add(b: mutable.Map[String, Long], v: String, n: Long): Unit =
    b.get(v) match {
      case Some(c) => b.update(v, c + n)
      case None =>
        if (b.size < capacity) b.update(v, n)
        else {
          // SpaceSaving eviction: replace the min counter, inherit count.
          val (minV, minC) = b.minBy { case (value, c) => (c, value) }
          b.remove(minV)
          b.update(v, minC + n)
        }
    }

  def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (v, n) => add(a, v, n) }
    a
  }

  /** Top-k values by (count desc, value asc) — deterministic tie-break. */
  def finish(b: mutable.Map[String, Long]): Seq[String] =
    b.toSeq.sortBy { case (v, c) => (-c, v) }.take(k).map(_._1)

  def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

/** topKWeighted (reference AggregateFunctionTopK.cpp weighted variant):
  * SpaceSaving where each occurrence adds `weight` instead of 1. */
class TopKWeightedAggregator(k: Int, loadFactor: Int = 10)
    extends Aggregator[(String, Long), mutable.Map[String, Long], Seq[String]] {
  private val inner = new TopKAggregator(k, loadFactor)
  def zero: mutable.Map[String, Long] = inner.zero
  def reduce(b: mutable.Map[String, Long], v: (String, Long)): mutable.Map[String, Long] = {
    if (v._1 != null) inner.merge(b, mutable.Map(v._1 -> v._2))
    b
  }
  def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] =
    inner.merge(a, b)
  def finish(b: mutable.Map[String, Long]): Seq[String] = inner.finish(b)
  def bufferEncoder: Encoder[mutable.Map[String, Long]] = inner.bufferEncoder
  def outputEncoder: Encoder[Seq[String]] = inner.outputEncoder
}

object TopK {
  /** Untyped column form: topK(k) over a string column. */
  def topK(col: Column, k: Int): Column =
    udaf(new TopKAggregator(k), Encoders.STRING).apply(col)

  /** topKWeighted(k) over (value, weight) columns. */
  def topKWeighted(value: Column, weight: Column, k: Int): Column =
    udaf(new TopKWeightedAggregator(k),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)).apply(value, weight)
}
