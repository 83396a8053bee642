package graft.aggregates

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** windowFunnel (reference:
  * src/AggregateFunctions/AggregateFunctionWindowFunnel.cpp:277):
  * searches for the longest prefix of `steps` as an ordered chain of
  * events where the whole chain fits inside `windowMicros` starting from
  * each step-1 occurrence. Returns the max level reached (0..steps.length).
  *
  * Buffer holds only (timestamp, stepIndex) pairs for events that ARE
  * funnel steps — bounded by the per-key step-event count, merged
  * associatively, sorted once in finish. This mirrors the reference's
  * buffer-of-(ts,event)-pairs design and keeps map-side partial
  * aggregation effective on a cluster (only step events shuffle).
  */
class WindowFunnelAggregator(windowMicros: Long, steps: Seq[String])
    extends Aggregator[(Long, String), List[(Long, Int)], Int] {
  private val stepIndex: Map[String, Int] = steps.zipWithIndex.toMap

  def zero: List[(Long, Int)] = Nil

  def reduce(b: List[(Long, Int)], ev: (Long, String)): List[(Long, Int)] =
    stepIndex.get(ev._2) match {
      case Some(i) => (ev._1, i) :: b
      case None    => b
    }

  def merge(a: List[(Long, Int)], b: List[(Long, Int)]): List[(Long, Int)] = a ::: b

  def finish(b: List[(Long, Int)]): Int = {
    // Reference semantics: for each step-0 event, greedily advance through
    // later events matching the next step, all within the window.
    val sorted = b.sortBy(identity)
    var best = 0
    var i = 0
    val arr = sorted.toArray
    while (i < arr.length && best < steps.length) {
      if (arr(i)._2 == 0) {
        val t0 = arr(i)._1
        var level = 1
        var j = i + 1
        while (j < arr.length && level < steps.length && arr(j)._1 - t0 <= windowMicros) {
          if (arr(j)._2 == level) level += 1
          j += 1
        }
        if (level > best) best = level
      }
      i += 1
    }
    best
  }

  def bufferEncoder: Encoder[List[(Long, Int)]] = Encoders.kryo[List[(Long, Int)]]
  def outputEncoder: Encoder[Int] = Encoders.scalaInt
}

object Funnel {
  /** windowFunnel(window)(tsMicros, event, steps...) as an untyped column.
    * `ts` must be microseconds-since-epoch (use unix_micros(ts)). */
  def windowFunnel(tsMicros: Column, event: Column, windowMicros: Long, steps: Seq[String]): Column =
    udaf(new WindowFunnelAggregator(windowMicros, steps),
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .apply(tsMicros, event)
}
