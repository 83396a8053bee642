package graft.queries

import graft.core.Tables
import graft.ops.Ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.5; reference WindowTransform.cpp):
  * ranking, offset (lag/lead), value (first/last/nth), frames
  * (ROWS/RANGE), QUALIFY, WITH TIES, nonNegativeDerivative.
  *
  * Window order keys always include a unique tie-breaker where the frame
  * result depends on row identity (row_number, lag, frames); rank-family
  * columns may legitimately order on non-unique keys (ties share a rank,
  * so output stays deterministic).
  */
object Windows {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  /** GROUPS-frame property sweep (reference WindowDescription.h:30-44
    * FrameType::Groups): 55 deterministic random frame specs — lower/upper
    * bounds in peer-group offsets, negatives and empty-capable frames
    * included — generated from a fixed seed so the Spark query and the
    * DuckDB oracle derive from the SAME list. The oracle does not use
    * window frames at all (DuckDB 1.0 lacks GROUPS mode): it re-derives
    * the semantics from first principles as a rank-range join over
    * per-peer-group rows, which is an independent construction from our
    * RANGE-over-dense_rank implementation in Ops.groupsFrameAgg. */
  private[queries] case class GSpec(id: Int, lower: Int, upper: Int, agg: String)
  private[queries] val groupsSweepSpecs: Seq[GSpec] = {
    val rnd = new scala.util.Random(20260814L)
    val aggs = Seq("sum", "count", "min", "max", "avg")
    (0 until 55).map { i =>
      val l = rnd.nextInt(9) - 4 // [-4, 4]
      val u = l + rnd.nextInt(6) // [l, l+5]
      GSpec(i, l, u, aggs(i % aggs.length))
    }
  }

  val queries: Map[String, Q] = Map(
    // rank / dense_rank / percent_rank over ties + row_number over a
    // fully-deterministic order (reference WindowTransform.cpp:1495,1513).
    "q_win_rank" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_orderkey") < 1000)
      val wTies = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity").desc)
      val wUnique = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
      ordered(li.select(
        col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        rank().over(wTies).as("rnk"),
        dense_rank().over(wTies).as("drnk"),
        percent_rank().over(wTies).as("prnk"),
        row_number().over(wUnique).as("rn")))
    },

    // lag/lead (reference WindowTransform.cpp:2269).
    "q_win_lag_lead" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      ordered(o.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price")))
    },

    // Running + moving aggregates over ROWS frames.
    "q_win_running" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      ordered(o.select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("running_sum"),
        avg(col("o_totalprice")).over(w.rowsBetween(-2, 0)).as("mov_avg3"),
        count(lit(1)).over(w.rowsBetween(0, Window.unboundedFollowing)).as("remaining")))
    },

    // RANGE frame on a numeric order key (reference WindowDescription.h:32).
    "q_win_range_frame" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
        .rangeBetween(-100, 100)
      ordered(o.select(
        col("o_orderstatus"), col("o_orderkey"),
        sum(col("o_totalprice")).over(w).as("nearby_sum"),
        count(lit(1)).over(w).as("nearby_n")))
    },

    // first_value / last_value / nth_value over full-partition frame
    // (reference WindowTransform.cpp:2422).
    "q_win_first_last" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_orderkey") < 2000)
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ordered(li.select(
        col("l_orderkey"), col("l_linenumber"),
        first(col("l_extendedprice")).over(w).as("first_price"),
        last(col("l_extendedprice")).over(w).as("last_price"),
        nth_value(col("l_extendedprice"), 2).over(w).as("second_price")))
    },

    // ntile + cume_dist on a unique order (reference WindowTransform.cpp:2023).
    "q_win_ntile" -> { (s, dir) =>
      val c = T(s, dir)("customer")
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
      ordered(c.select(
        col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cd")))
    },

    // Share-of-total (semantically a global window). Computed as a
    // partial-aggregated grand total broadcast back via cross join — the
    // scale-safe form of sum() OVER (): no single-partition WindowExec.
    // Both sides round to 12 decimals because the distributed partial-sum
    // fold order differs from the oracle's sequential one at the last ULP.
    "q_win_share" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      val total = o.agg(sum(col("o_totalprice")).as("__tot"))
      ordered(o.crossJoin(broadcast(total)).select(
        col("o_orderkey"),
        round(col("o_totalprice") / col("__tot"), 12).as("share")))
    },

    // QUALIFY (reference ParserSelectQuery.cpp:298): latest order per
    // customer, filtered on a window column.
    "q_qualify" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").desc)
      ordered(o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")))
    },

    // LIMIT WITH TIES (reference LimitTransform.h:27) via Ops.limitWithTies
    // on raw column values (bit-identical across engines).
    "q_limit_with_ties" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(Ops.limitWithTies(li.select(col("l_quantity")),
        Seq(col("l_quantity").desc), Seq(col("l_quantity")), 100))
    },

    // GROUPS frame (reference WindowDescription.h frame-type GROUPS; no
    // native Spark support — Ops.groupsFrameAgg emulates via dense_rank +
    // RANGE; oracle uses DuckDB's NATIVE GROUPS frame).
    "q_win_groups_frame" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_orderkey") < 2000)
      ordered(Ops.groupsFrameAgg(li,
          partitionBy = Seq(col("l_returnflag")),
          orderBy = Seq(col("l_quantity")),
          nPreceding = 1, nFollowing = 1,
          agg = sum, valueCol = col("l_extendedprice"), out = "grp_sum")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("grp_sum")))
    },

    // GROUPS-frame sweep: every spec in groupsSweepSpecs evaluated over
    // the same base frame in ONE pass (all windows share the partition +
    // dense-rank order, so Spark plans a single exchange/sort with
    // chained window nodes), then unpivoted to (spec, u, k, v, out).
    "q_groups_frame_sweep" -> { (s, dir) =>
      val base = T(s, dir)("events").filter(col("user_id") < 8)
        .select(col("user_id").as("u"),
          date_trunc("day", col("ts")).cast("date").as("k"),
          floor(col("value")).cast("long").as("v"))
      val withDr = base.withColumn("__dr",
        dense_rank().over(Window.partitionBy(col("u")).orderBy(col("k"))))
      val withOuts = groupsSweepSpecs.foldLeft(withDr) { (acc, sp) =>
        val w = Window.partitionBy(col("u")).orderBy(col("__dr"))
          .rangeBetween(sp.lower.toLong, sp.upper.toLong)
        val a = sp.agg match {
          case "sum"   => sum(col("v"))
          case "count" => count(col("v"))
          case "min"   => min(col("v"))
          case "max"   => max(col("v"))
          case "avg"   => avg(col("v"))
        }
        acc.withColumn(s"out_${sp.id}", a.over(w).cast("double"))
      }
      val stackExpr = "stack(" + groupsSweepSpecs.length + ", " +
        groupsSweepSpecs.map(sp => s"${sp.id}, out_${sp.id}").mkString(", ") +
        ") as (spec, out)"
      ordered(withOuts
        .select(col("u"), col("k"), col("v"), expr(stackExpr))
        .select(col("spec"), col("u"), col("k"), col("v"), col("out")))
    },

    // nonNegativeDerivative (reference WindowTransform.cpp:2570): rate of
    // change of `value` per user over event time, clamped at 0.
    "q_win_derivative" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val dv = col("value") - lag(col("value"), 1).over(w)
      val dt = (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))) / lit(1e6)
      ordered(e.select(
        col("user_id"), col("event_id"),
        when(dt > 0, greatest(dv / dt, lit(0.0))).as("nn_deriv")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  rank() OVER wt AS rnk,
        |  dense_rank() OVER wt AS drnk,
        |  percent_rank() OVER wt AS prnk,
        |  row_number() OVER (PARTITION BY l_returnflag
        |     ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
        |FROM lineitem WHERE l_orderkey < 1000
        |WINDOW wt AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
        |ORDER BY l_returnflag NULLS FIRST, l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, l_quantity NULLS FIRST, rnk NULLS FIRST, drnk NULLS FIRST, prnk NULLS FIRST, rn NULLS FIRST""".stripMargin,
    "q_win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  lag(o_totalprice, 2, -1.0) OVER w AS prev2_price
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST, o_totalprice NULLS FIRST, prev_price NULLS FIRST, next_price NULLS FIRST, prev2_price NULLS FIRST""".stripMargin,
    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_sum,
        |  avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg3,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS remaining
        |FROM orders
        |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST, running_sum NULLS FIRST, mov_avg3 NULLS FIRST, remaining NULLS FIRST""".stripMargin,
    "q_win_range_frame" ->
      """SELECT o_orderstatus, o_orderkey,
        |  sum(o_totalprice) OVER w AS nearby_sum,
        |  count(*) OVER w AS nearby_n
        |FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
        |  RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderkey NULLS FIRST, nearby_sum NULLS FIRST, nearby_n NULLS FIRST""".stripMargin,
    "q_win_first_last" ->
      """SELECT l_orderkey, l_linenumber,
        |  first_value(l_extendedprice) OVER w AS first_price,
        |  last_value(l_extendedprice) OVER w AS last_price,
        |  nth_value(l_extendedprice, 2) OVER w AS second_price
        |FROM lineitem WHERE l_orderkey < 2000
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, first_price NULLS FIRST, last_price NULLS FIRST, second_price NULLS FIRST""".stripMargin,
    "q_win_ntile" ->
      """SELECT c_mktsegment, c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  cume_dist() OVER w AS cd
        |FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey)
        |ORDER BY c_mktsegment NULLS FIRST, c_custkey NULLS FIRST, quartile NULLS FIRST, cd NULLS FIRST""".stripMargin,
    "q_win_share" ->
      """SELECT o_orderkey, round(o_totalprice / sum(o_totalprice) OVER (), 12) AS share
        |FROM orders
        |ORDER BY o_orderkey NULLS FIRST, share NULLS FIRST""".stripMargin,
    "q_qualify" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST, o_totalprice NULLS FIRST""".stripMargin,
    "q_limit_with_ties" ->
      """SELECT l_quantity FROM (
        |  SELECT l_quantity, rank() OVER (ORDER BY l_quantity DESC) AS rk
        |  FROM lineitem) WHERE rk <= 100
        |ORDER BY l_quantity NULLS FIRST""".stripMargin,
    "q_win_groups_frame" ->
      """WITH r AS (SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    l_extendedprice,
        |    dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS dr
        |  FROM lineitem WHERE l_orderkey < 2000)
        |SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  sum(l_extendedprice) OVER (PARTITION BY l_returnflag ORDER BY dr
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS grp_sum
        |FROM r
        |ORDER BY l_returnflag NULLS FIRST, l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, l_quantity NULLS FIRST, grp_sum NULLS FIRST""".stripMargin,
    "q_groups_frame_sweep" -> {
      val selects = groupsSweepSpecs.map { sp =>
        val fn = s"${sp.agg}(g.v)"
        s"""SELECT ${sp.id} AS spec, r.u, r.k, r.v, CAST($fn AS DOUBLE) AS out
           |FROM ranked r LEFT JOIN ranked g
           |  ON g.u = r.u AND g.dr BETWEEN r.dr + (${sp.lower}) AND r.dr + (${sp.upper})
           |GROUP BY r.u, r.k, r.v, r.rn""".stripMargin
      }
      s"""WITH base AS (
         |  SELECT user_id AS u,
         |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS k,
         |    CAST(floor(value) AS BIGINT) AS v
         |  FROM events WHERE user_id < 8),
         |ranked AS (
         |  SELECT u, k, v,
         |    dense_rank() OVER (PARTITION BY u ORDER BY k) AS dr,
         |    row_number() OVER (PARTITION BY u ORDER BY k) AS rn
         |  FROM base)
         |${selects.mkString("\nUNION ALL\n")}
         |ORDER BY spec NULLS FIRST, u NULLS FIRST, k NULLS FIRST, v NULLS FIRST, out NULLS FIRST""".stripMargin
    },
    "q_win_derivative" ->
      """SELECT user_id, event_id,
        |  CASE WHEN dt > 0 THEN greatest(dv / dt, 0.0) END AS nn_deriv
        |FROM (
        |  SELECT user_id, event_id,
        |    value - lag(value, 1) OVER w AS dv,
        |    (epoch_us(CAST(ts AS TIMESTAMP))
        |      - epoch_us(CAST(lag(ts, 1) OVER w AS TIMESTAMP))) / 1e6 AS dt
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |ORDER BY user_id NULLS FIRST, event_id NULLS FIRST, nn_deriv NULLS FIRST""".stripMargin
  )
}
