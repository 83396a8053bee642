package graft

import graft.aggregates.{Funnel, TopK}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("topK returns values by frequency with deterministic tie-break") {
    import spark.implicits._
    val df = Seq("a", "b", "b", "c", "c", "c", "d").toDF("v")
    val got = df.agg(TopK.topK(col("v"), 2).as("top")).collect()(0).getSeq[String](0)
    assert(got == Seq("c", "b"))
  }

  test("topK tie-break is lexicographic") {
    import spark.implicits._
    val df = Seq("x", "a", "x", "a", "b").toDF("v")
    val got = df.agg(TopK.topK(col("v"), 2).as("top")).collect()(0).getSeq[String](0)
    assert(got == Seq("a", "x")) // both count 2, 'a' < 'x'
  }

  test("windowFunnel counts ordered chain within window") {
    import spark.implicits._
    // user 1: full chain inside window; user 2: purchase before click;
    // user 3: chain exceeds window.
    val day = 86400000000L
    val df = Seq(
      (1L, 0L * day, "signup"), (1L, 1L * day, "click"), (1L, 2L * day, "purchase"),
      (2L, 0L * day, "signup"), (2L, 1L * day, "purchase"), (2L, 2L * day, "click"),
      (3L, 0L * day, "signup"), (3L, 10L * day, "click"), (3L, 11L * day, "purchase")
    ).toDF("u", "us", "t")
    val got = df.groupBy($"u")
      .agg(Funnel.windowFunnel($"us", $"t", 7 * day, Seq("signup", "click", "purchase")).as("lvl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1))
  }
}
