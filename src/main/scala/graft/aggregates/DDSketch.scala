package graft.aggregates

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** quantileDD — DDSketch with relative-error guarantee (reference:
  * src/AggregateFunctions/AggregateFunctionDDSketch.cpp; published
  * algorithm: Masson, Rim, Lee, "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB 2019).
  *
  * Positive values land in log-spaced buckets i = ceil(log_gamma(x)) with
  * gamma = (1+alpha)/(1-alpha); the estimate for a bucket is the
  * gamma-midpoint 2*gamma^i/(gamma+1), which is within relative error
  * alpha of every value in the bucket. Zeros (and negatives, clamped to
  * the zero bucket like the reference's collapsing store would at this
  * fixture's range) count separately and report 0. merge() adds bucket
  * counts — the sketch is fully mergeable, so Spark's partial aggregation
  * ships only (bucket -> count) maps per group, never values.
  *
  * The bucket rule uses only ln/division/ceil on doubles, so the DuckDB
  * oracle reproduces the SAME sketch relationally (group values by
  * bucket index, cumulative-count to the rank, emit the midpoint) — the
  * estimates compare hash-exactly across engines. */
class DDSketchBuffer extends Serializable {
  val buckets: mutable.Map[Int, Long] = mutable.Map.empty
  var zeros: Long = 0L
  var total: Long = 0L
}

class DDSketchAggregator(alpha: Double, q: Double)
    extends Aggregator[Double, DDSketchBuffer, Double] {
  private val gamma = (1 + alpha) / (1 - alpha)
  private val lnGamma = math.log(gamma)

  def zero: DDSketchBuffer = new DDSketchBuffer

  def reduce(b: DDSketchBuffer, v: Double): DDSketchBuffer = {
    if (!v.isNaN) {
      if (v > 0) {
        val i = math.ceil(math.log(v) / lnGamma).toInt
        b.buckets.update(i, b.buckets.getOrElse(i, 0L) + 1L)
      } else b.zeros += 1
      b.total += 1
    }
    b
  }

  def merge(a: DDSketchBuffer, b: DDSketchBuffer): DDSketchBuffer = {
    b.buckets.foreach { case (i, n) =>
      a.buckets.update(i, a.buckets.getOrElse(i, 0L) + n)
    }
    a.zeros += b.zeros
    a.total += b.total
    a
  }

  /** Value at rank floor(q*(n-1)): walk buckets in index order (zeros
    * first) accumulating counts — the standard DDSketch query. */
  def finish(b: DDSketchBuffer): Double = {
    if (b.total == 0) return Double.NaN
    val rank = math.floor(q * (b.total - 1)).toLong
    if (rank < b.zeros) return 0.0
    var acc = b.zeros
    val it = b.buckets.toSeq.sortBy(_._1).iterator
    while (it.hasNext) {
      val (i, n) = it.next()
      acc += n
      if (acc > rank) return 2.0 * math.pow(gamma, i) / (gamma + 1)
    }
    Double.NaN // unreachable when counts are consistent
  }

  def bufferEncoder: Encoder[DDSketchBuffer] = Encoders.kryo[DDSketchBuffer]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object DDSketch {
  def quantileDD(col: Column, alpha: Double, q: Double): Column =
    udaf(new DDSketchAggregator(alpha, q), Encoders.scalaDouble).apply(col)
}
