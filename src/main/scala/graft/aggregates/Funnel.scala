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

/** windowFunnel with the reference's mode flags (reference
  * AggregateFunctionWindowFunnel.cpp strict_order/strict_dedup/
  * strict_increase; semantics per the documented behavior, re-derived):
  *
  *  - strict_order: ANY other event between two matched steps interrupts
  *    the chain (A→B→D→C finds only A→B) — so non-step events are
  *    buffered too (step = -1), and the matched chain must be consecutive
  *    in the per-key event sequence;
  *  - strict_dedup: a repeat of an already-matched step interrupts;
  *  - strict_increase: steps advance only on strictly increasing
  *    timestamps (ties never advance).
  *
  * Events are ordered by (ts, eventId) so ties are deterministic and the
  * SQL oracle (lead() over the same ordering) sees the same sequence.
  */
class WindowFunnelModesAggregator(windowMicros: Long, steps: Seq[String], modes: Set[String])
    extends Aggregator[(Long, Long, String), List[(Long, Long, Int)], Int] {
  private val stepIndex: Map[String, Int] = steps.zipWithIndex.toMap
  private val strictOrder = modes.contains("strict_order")
  private val strictDedup = modes.contains("strict_dedup")
  private val strictIncrease = modes.contains("strict_increase")

  def zero: List[(Long, Long, Int)] = Nil

  def reduce(b: List[(Long, Long, Int)], ev: (Long, Long, String)): List[(Long, Long, Int)] =
    stepIndex.get(ev._3) match {
      case Some(i)              => (ev._1, ev._2, i) :: b
      case None if strictOrder  => (ev._1, ev._2, -1) :: b
      case None                 => b
    }

  def merge(a: List[(Long, Long, Int)], b: List[(Long, Long, Int)]): List[(Long, Long, Int)] =
    a ::: b

  def finish(b: List[(Long, Long, Int)]): Int = {
    val arr = b.sortBy(t => (t._1, t._2)).toArray
    var best = 0
    var i = 0
    while (i < arr.length && best < steps.length) {
      if (arr(i)._3 == 0) {
        val t0 = arr(i)._1
        var tPrev = t0
        var level = 1
        var j = i + 1
        var broken = false
        while (!broken && j < arr.length && level < steps.length &&
            arr(j)._1 - t0 <= windowMicros) {
          val s = arr(j)._3
          if (s == level && (!strictIncrease || arr(j)._1 > tPrev)) {
            level += 1; tPrev = arr(j)._1
          } else if (strictOrder && s != level) broken = true
          else if (strictDedup && s >= 0 && s < level) broken = true
          j += 1
        }
        if (level > best) best = level
      }
      i += 1
    }
    best
  }

  def bufferEncoder: Encoder[List[(Long, Long, Int)]] = Encoders.kryo[List[(Long, Long, Int)]]
  def outputEncoder: Encoder[Int] = Encoders.scalaInt
}

object Funnel {
  /** windowFunnel(window)(tsMicros, event, steps...) as an untyped column.
    * `ts` must be microseconds-since-epoch (use unix_micros(ts)). */
  def windowFunnel(tsMicros: Column, event: Column, windowMicros: Long, steps: Seq[String]): Column =
    udaf(new WindowFunnelAggregator(windowMicros, steps),
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .apply(tsMicros, event)

  /** windowFunnel(window, modes)(tsMicros, eventId, event, steps...). */
  def windowFunnelModes(tsMicros: Column, eventId: Column, event: Column,
      windowMicros: Long, steps: Seq[String], modes: Set[String]): Column =
    udaf(new WindowFunnelModesAggregator(windowMicros, steps, modes),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING))
      .apply(tsMicros, eventId, event)
}
