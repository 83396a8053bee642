package graft.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** largestTriangleThreeBuckets(n)(x, y) (reference:
  * src/AggregateFunctions/AggregateFunctionLargestTriangleThreeBuckets.cpp;
  * published algorithm: Sveinn Steinarsson, "Downsampling Time Series for
  * Visual Representation", MSc thesis, University of Iceland 2013).
  *
  * Selects n points that preserve the visual shape of a series: first and
  * last always kept; each interior bucket contributes the point forming
  * the largest triangle with the previously selected point and the next
  * bucket's centroid. The selection is sequential by nature, so the
  * buffer collects (x, y) pairs and finish() sorts once and runs the
  * O(points) sweep — the right trade for a per-group DOWNSAMPLING
  * aggregate whose input is one series (bounded per group), not the
  * whole table.
  */
class LttbAggregator(n: Int)
    extends Aggregator[(Double, Double), ArrayBuffer[(Double, Double)], Seq[(Double, Double)]] {

  def zero: ArrayBuffer[(Double, Double)] = ArrayBuffer.empty

  def reduce(b: ArrayBuffer[(Double, Double)], v: (Double, Double)): ArrayBuffer[(Double, Double)] = {
    b += v; b
  }

  def merge(a: ArrayBuffer[(Double, Double)], b: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    a ++= b; a
  }

  def finish(buf: ArrayBuffer[(Double, Double)]): Seq[(Double, Double)] = {
    val pts = buf.sortBy(p => (p._1, p._2)).toArray
    val m = pts.length
    if (m <= n || n < 3) return pts.toSeq
    val out = ArrayBuffer[(Double, Double)](pts(0))
    // interior points split into n-2 buckets
    val every = (m - 2).toDouble / (n - 2)
    var a = 0 // index of previously selected point
    var i = 0
    while (i < n - 2) {
      val rangeStart = (i * every).toInt + 1
      val rangeEnd = math.min(((i + 1) * every).toInt + 1, m - 1)
      // centroid of the NEXT bucket (or the last point for the final one)
      val nextStart = math.min(((i + 1) * every).toInt + 1, m - 1)
      val nextEnd = math.min(((i + 2) * every).toInt + 1, m)
      var cx = 0.0; var cy = 0.0; var cn = 0
      var j = nextStart
      while (j < nextEnd) { cx += pts(j)._1; cy += pts(j)._2; cn += 1; j += 1 }
      if (cn == 0) { cx = pts(m - 1)._1; cy = pts(m - 1)._2; cn = 1 }
      cx /= cn; cy /= cn
      val (ax, ay) = pts(a)
      var best = -1.0; var bestIdx = rangeStart
      j = rangeStart
      while (j < rangeEnd) {
        val area = math.abs((ax - cx) * (pts(j)._2 - ay) - (ax - pts(j)._1) * (cy - ay))
        if (area > best) { best = area; bestIdx = j }
        j += 1
      }
      out += pts(bestIdx)
      a = bestIdx
      i += 1
    }
    out += pts(m - 1)
    out.toSeq
  }

  def bufferEncoder: Encoder[ArrayBuffer[(Double, Double)]] =
    Encoders.kryo[ArrayBuffer[(Double, Double)]]
  def outputEncoder: Encoder[Seq[(Double, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Double)]]()
}
