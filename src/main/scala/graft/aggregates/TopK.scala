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
  *
  * Eviction is O(log capacity) via a lazily built (count -> values)
  * ordered index (the reference keeps an intrusive min-structure for the
  * same reason); the index is transient — it is rebuilt on first eviction
  * after deserialization and maintained incrementally afterwards, and
  * never built at all for under-capacity groups.
  */
class SpaceSavingBuffer extends Serializable {
  val counts: mutable.Map[String, Long] = mutable.Map.empty
  // count -> sorted values at that count; deterministic min = (firstKey, first value)
  @transient private var index: java.util.TreeMap[Long, java.util.TreeSet[String]] = _

  private def indexAdd(v: String, c: Long): Unit = {
    val set = index.computeIfAbsent(c, _ => new java.util.TreeSet[String]())
    set.add(v)
  }
  private def indexRemove(v: String, c: Long): Unit = {
    val set = index.get(c)
    if (set != null) { set.remove(v); if (set.isEmpty) index.remove(c) }
  }
  private def ensureIndex(): Unit = if (index == null) {
    index = new java.util.TreeMap[Long, java.util.TreeSet[String]]()
    counts.foreach { case (v, c) => indexAdd(v, c) }
  }

  def add(v: String, n: Long, capacity: Int): Unit = counts.get(v) match {
    case Some(c) =>
      counts.update(v, c + n)
      if (index != null) { indexRemove(v, c); indexAdd(v, c + n) }
    case None =>
      if (counts.size < capacity) {
        counts.update(v, n)
        if (index != null) indexAdd(v, n)
      } else {
        // SpaceSaving eviction: replace the min counter, inherit count.
        ensureIndex()
        val minC = index.firstKey()
        val minV = index.get(minC).first()
        counts.remove(minV)
        indexRemove(minV, minC)
        counts.update(v, minC + n)
        indexAdd(v, minC + n)
      }
  }
}

class TopKAggregator(k: Int, loadFactor: Int = 10)
    extends Aggregator[String, SpaceSavingBuffer, Seq[String]] {
  private val capacity = k * loadFactor

  def zero: SpaceSavingBuffer = new SpaceSavingBuffer

  def reduce(b: SpaceSavingBuffer, v: String): SpaceSavingBuffer = {
    if (v != null) b.add(v, 1L, capacity)
    b
  }

  def merge(a: SpaceSavingBuffer, b: SpaceSavingBuffer): SpaceSavingBuffer = {
    b.counts.foreach { case (v, n) => a.add(v, n, capacity) }
    a
  }

  /** Top-k values by (count desc, value asc) — deterministic tie-break. */
  def finish(b: SpaceSavingBuffer): Seq[String] =
    b.counts.toSeq.sortBy { case (v, c) => (-c, v) }.take(k).map(_._1)

  def bufferEncoder: Encoder[SpaceSavingBuffer] = Encoders.kryo[SpaceSavingBuffer]
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

/** topKWeighted (reference AggregateFunctionTopK.cpp weighted variant):
  * SpaceSaving where each occurrence adds `weight` instead of 1. */
class TopKWeightedAggregator(k: Int, loadFactor: Int = 10)
    extends Aggregator[(String, Long), SpaceSavingBuffer, Seq[String]] {
  private val inner = new TopKAggregator(k, loadFactor)
  private val capacity = k * loadFactor
  def zero: SpaceSavingBuffer = inner.zero
  def reduce(b: SpaceSavingBuffer, v: (String, Long)): SpaceSavingBuffer = {
    if (v._1 != null) b.add(v._1, v._2, capacity)
    b
  }
  def merge(a: SpaceSavingBuffer, b: SpaceSavingBuffer): SpaceSavingBuffer =
    inner.merge(a, b)
  def finish(b: SpaceSavingBuffer): Seq[String] = inner.finish(b)
  def bufferEncoder: Encoder[SpaceSavingBuffer] = inner.bufferEncoder
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
