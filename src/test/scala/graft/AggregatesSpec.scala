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

  test("windowFunnel strict modes: order, dedup, increase") {
    import spark.implicits._
    val day = 86400000000L
    // user 1: A,B,D,C — strict_order stops at D (level 2), default gives 3.
    // user 2: A,B,A,C — strict_dedup stops at the repeated A (level 2).
    // user 3: A,B at the SAME timestamp, then C — strict_increase can
    //         never advance past A (level 1); default gives 3.
    val df = Seq(
      (1L, 1L, 0L * day, "A"), (1L, 2L, 1L * day, "B"),
      (1L, 3L, 2L * day, "D"), (1L, 4L, 3L * day, "C"),
      (2L, 5L, 0L * day, "A"), (2L, 6L, 1L * day, "B"),
      (2L, 7L, 2L * day, "A"), (2L, 8L, 3L * day, "C"),
      (3L, 9L, 0L * day, "A"), (3L, 10L, 0L * day, "B"), (3L, 11L, 1L * day, "C")
    ).toDF("u", "id", "ts", "ev")
    def funnel(modes: Set[String]) = Funnel.windowFunnelModes(
      col("ts"), col("id"), col("ev"), 10L * day, Seq("A", "B", "C"), modes)
    val r = df.groupBy("u").agg(
        funnel(Set.empty).as("plain"),
        funnel(Set("strict_order")).as("so"),
        funnel(Set("strict_dedup")).as("sd"),
        funnel(Set("strict_increase")).as("si"))
      .orderBy("u").collect()
    assert(r(0).getInt(1) == 3 && r(0).getInt(2) == 2) // u1 plain=3, strict_order=2
    assert(r(1).getInt(1) == 3 && r(1).getInt(3) == 2) // u2 plain=3, strict_dedup=2
    assert(r(2).getInt(1) == 3 && r(2).getInt(4) == 1) // u3 plain=3, strict_increase=1
  }

  test("LTTB keeps endpoints and the dominant spike") {
    import spark.implicits._
    val lttb = udaf(new graft.aggregates.LttbAggregator(5))
    // flat line with a spike at x=50
    val pts = (0 until 100).map(i => (i.toDouble, if (i == 50) 100.0 else 1.0))
    val got = pts.toDF("x", "y").agg(lttb(col("x"), col("y")).as("p"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got.length == 5)
    assert(got.head == (0.0, 1.0) && got.last == (99.0, 1.0), "endpoints kept")
    assert(got.exists(_ == (50.0, 100.0)), "spike survives downsampling")
    assert(got.map(_._1) == got.map(_._1).sorted, "x stays ordered")
  }

  test("LTTB returns all points when n >= series length") {
    import spark.implicits._
    val lttb = udaf(new graft.aggregates.LttbAggregator(10))
    val pts = (0 until 6).map(i => (i.toDouble, i.toDouble * 2))
    val got = pts.toDF("x", "y").agg(lttb(col("x"), col("y")).as("p"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(got.length == 6)
  }

  test("KMV sketch: exact under k, within 10% over k, deterministic") {
    import spark.implicits._
    val kmv = udaf(new graft.aggregates.KmvDistinctAggregator(1024))
    val small = (1L to 500L).toDF("v").agg(kmv(col("v"))).collect()(0).getLong(0)
    assert(small == 500L, "below k the sketch is exact")
    val big1 = (1L to 50000L).toDF("v").agg(kmv(col("v"))).collect()(0).getLong(0)
    val big2 = (1L to 50000L).toDF("v").agg(kmv(col("v"))).collect()(0).getLong(0)
    assert(big1 == big2, "deterministic")
    assert(math.abs(big1 - 50000.0) / 50000.0 < 0.1, s"estimate $big1 within 10%")
  }
}
