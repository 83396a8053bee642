package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 aggregate tail (reference registerAggregateFunctions.cpp rows
  * still open after round 3): deltaSumTimestamp, groupArrayIntersect,
  * groupArraySorted, groupArrayMovingAvg, singleValueOrNull, and the
  * multi-feature least-squares analog of stochasticLinearRegression. */
object Aggregates7 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // deltaSumTimestamp(value, ts) (reference
    // AggregateFunctionDeltaSumTimestamp.cpp): positive deltas in ts
    // order; a delta is only charged when the timestamp strictly
    // advances (equal-ts rows are treated as one merged point).
    "q_delta_sum_ts" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ordered(e
        .withColumn("d", col("value") - lag(col("value"), 1).over(w))
        .withColumn("adv", col("ts") > lag(col("ts"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(sum(when(col("d") > 0 && col("adv"), col("d")).otherwise(0.0))
          .as("delta_sum_ts")))
    },

    // groupArrayIntersect (reference AggregateFunctionGroupArrayIntersect
    // .cpp): elements present in EVERY row of the group. Shape: distinct
    // (group, element) explode → per-element row count == group row count.
    "q_group_array_intersect" -> { (s, dir) =>
      val d = T(s, dir)("documents").filter(col("doc_id") < 150)
      val base = d.select(floor(col("doc_id") / 3).cast("long").as("grp"),
        col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      val nDocs = base.groupBy(col("grp")).agg(count(lit(1)).as("n_docs"))
      val tok = base.select(col("grp"), col("doc_id"), explode(col("toks")).as("tok"))
      ordered(tok.groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("n_with"))
        .join(nDocs, "grp")
        .filter(col("n_with") === col("n_docs"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_common"),
          concat_ws(",", sort_array(collect_list(col("tok")))).as("common_csv")))
    },

    // groupArraySorted(n) (reference AggregateFunctionGroupArraySorted
    // .cpp): the n smallest values, sorted.
    "q_group_array_sorted" -> { (s, dir) =>
      val c = T(s, dir)("customer")
      ordered(c.groupBy(col("c_mktsegment"))
        .agg(concat_ws(",",
          slice(sort_array(collect_list(col("c_name"))), 1, 5)).as("first5")))
    },

    // groupArrayMovingAvg (reference AggregateFunctionMoving.h) — window
    // size 3, ppm-scaled for engine-exact output; emitted per row like
    // the reference's array element.
    "q_moving_avg" -> { (s, dir) =>
      val e = T(s, dir)("events").filter(col("event_id") < 3000)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      ordered(e.select(col("user_id"), col("event_id"),
        floor(avg(col("value")).over(w) * 1000000).cast("long").as("mavg_ppm")))
    },

    // singleValueOrNull (reference AggregateFunctionSingleValueOrNull.h):
    // the group's value if it is unique, else NULL.
    "q_single_value_or_null" -> { (s, dir) =>
      val o = T(s, dir)("orders").filter(col("o_custkey") <= 500)
      ordered(o.groupBy(col("o_custkey"))
        .agg(when(count_distinct(col("o_orderstatus")) === 1,
            max(col("o_orderstatus"))).as("svon"),
          count(lit(1)).as("n")))
    },

    // quantileInterpolatedWeighted (reference
    // AggregateFunctionQuantileInterpolatedWeighted.cpp — the Wikipedia
    // weighted-percentile method): distinct values get cumulative-weight
    // positions p_i = (cum_i - w_i/2) / W; the level is linearly
    // interpolated between the bracketing positions. p is monotone in the
    // value, so the brackets are plain conditional min/max — no structs,
    // no global window (two-phase running total).
    "q_quantile_interp_weighted" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("x"),
          (pmod(col("l_suppkey"), lit(10)) + 1).cast("long").as("w"))
      val byVal = li.groupBy(col("g"), col("x")).agg(sum(col("w")).as("w"))
      val cum = graft.ops.Ops.keyedRunningTotal(
        byVal, Seq(col("g")), col("x"), col("w"), "cw",
        bucket = Some(floor(col("x") / 10)))
      val tot = byVal.groupBy(col("g").as("g2")).agg(sum(col("w")).as("tw"))
      val withP = cum.join(broadcast(tot), col("g") === col("g2"))
        .withColumn("p", (col("cw") - col("w") * 0.5) / col("tw"))
      def interp(q: Double) = {
        val lp = max(when(col("p") <= q, col("p")))
        val lx = max(when(col("p") <= q, col("x")))
        val up = min(when(col("p") >= q, col("p")))
        val ux = min(when(col("p") >= q, col("x")))
        val v = when(lp.isNull, ux.cast("double"))
          .when(up.isNull, lx.cast("double"))
          .when(up === lp, lx.cast("double"))
          .otherwise(lx + (ux - lx) * (lit(q) - lp) / (up - lp))
        floor(v * 1000000).cast("long")
      }
      ordered(withP.groupBy(col("g")).agg(
        interp(0.25).as("wq25_ppm"), interp(0.5).as("wq50_ppm"),
        interp(0.75).as("wq75_ppm")))
    },

    // Two-feature OLS with intercept via the normal equations — the
    // deterministic analog of stochasticLinearRegression (reference
    // AggregateFunctionMLMethod.cpp; closed form instead of SGD, exact
    // given exact moment sums). All moments are accumulated as LONGS
    // (cents / integer units), so the coefficient arithmetic is
    // bit-identical across engines.
    "q_linreg_multi" -> { (s, dir) =>
      val l = T(s, dir)("lineitem")
      val y = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val x1 = col("l_quantity").cast("long")
      val x2 = floor(col("l_discount") * 100 + 0.5).cast("long")
      val m = l.agg(
        count(lit(1)).as("n"),
        sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
        sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
        sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"))
      // Cramer on the 3x3 normal matrix [[n s1 s2][s1 s11 s12][s2 s12 s22]]
      val out = m.select(
        col("n").cast("double").as("n"), col("s1").cast("double").as("s1"),
        col("s2").cast("double").as("s2"), col("sy").cast("double").as("sy"),
        col("s11").cast("double").as("s11"), col("s12").cast("double").as("s12"),
        col("s22").cast("double").as("s22"), col("s1y").cast("double").as("s1y"),
        col("s2y").cast("double").as("s2y"))
      val det = expr("n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)")
      val b0 = expr("sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)")
      val b1 = expr("n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)")
      val b2 = expr("n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)")
      out.select(
        floor(b0 / det * 1000000).cast("long").as("intercept_ppm"),
        floor(b1 / det * 1000000).cast("long").as("coef_qty_ppm"),
        floor(b2 / det * 1000000).cast("long").as("coef_disc_ppm"))
    },

    // quantileDD — REAL DDSketch (reference
    // AggregateFunctionDDSketch.cpp; Masson et al. VLDB 2019): log-spaced
    // buckets i = ceil(log_gamma(x)), gamma = (1+a)/(1-a), estimate =
    // gamma-midpoint of the bucket holding rank floor(q*(n-1)). The
    // DuckDB oracle rebuilds the SAME sketch relationally (bucket
    // groupBy + running count), so the relative-error estimates compare
    // exactly — only ln/ceil/pow on identical doubles.
    "q_quantile_dd" -> { (s, dir) =>
      import graft.aggregates.DDSketch.quantileDD
      val l = T(s, dir)("lineitem")
      ordered(l.groupBy(col("l_returnflag")).agg(
        round(quantileDD(col("l_quantity"), 0.01, 0.5), 9).as("dd_p50"),
        round(quantileDD(col("l_quantity"), 0.01, 0.9), 9).as("dd_p90"),
        round(quantileDD(col("l_extendedprice"), 0.01, 0.99), 9).as("dd_p99_price"),
        count(lit(1)).as("n")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_delta_sum_ts" ->
      """SELECT user_id,
        |  sum(CASE WHEN d > 0 AND adv THEN d ELSE 0.0 END) AS delta_sum_ts
        |FROM (
        |  SELECT user_id,
        |    value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d,
        |    ts > lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS adv
        |  FROM events)
        |GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, delta_sum_ts NULLS FIRST""".stripMargin,
    "q_group_array_intersect" ->
      """WITH base AS (SELECT CAST(floor(doc_id / 3) AS BIGINT) AS grp, doc_id,
        |      list_distinct(string_split(text, ' ')) AS toks
        |    FROM documents WHERE doc_id < 150),
        |nd AS (SELECT grp, count(*) AS n_docs FROM base GROUP BY grp),
        |tok AS (SELECT grp, doc_id, unnest(toks) AS tok FROM base)
        |SELECT grp,
        |  cast(count(*) AS bigint) AS n_common,
        |  string_agg(tok, ',' ORDER BY tok) AS common_csv
        |FROM (
        |  SELECT t.grp, t.tok FROM tok t
        |  JOIN nd ON t.grp = nd.grp
        |  GROUP BY t.grp, t.tok, nd.n_docs
        |  HAVING count(*) = nd.n_docs)
        |GROUP BY grp
        |ORDER BY grp NULLS FIRST, n_common NULLS FIRST, common_csv NULLS FIRST""".stripMargin,
    "q_group_array_sorted" ->
      """SELECT c_mktsegment,
        |  array_to_string(list_sort(list(c_name))[1:5], ',') AS first5
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment NULLS FIRST, first5 NULLS FIRST""".stripMargin,
    "q_moving_avg" ->
      """SELECT user_id, event_id,
        |  cast(floor(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 1000000) AS bigint) AS mavg_ppm
        |FROM events WHERE event_id < 3000
        |ORDER BY user_id NULLS FIRST, event_id NULLS FIRST, mavg_ppm NULLS FIRST""".stripMargin,
    "q_single_value_or_null" ->
      """SELECT o_custkey,
        |  CASE WHEN count(DISTINCT o_orderstatus) = 1 THEN max(o_orderstatus) END AS svon,
        |  count(*) AS n
        |FROM orders WHERE o_custkey <= 500
        |GROUP BY o_custkey
        |ORDER BY o_custkey NULLS FIRST, svon NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_quantile_interp_weighted" ->
      """WITH li AS (SELECT l_returnflag g, CAST(l_quantity AS BIGINT) x,
        |    CAST(l_suppkey % 10 + 1 AS BIGINT) w FROM lineitem),
        |bv AS (SELECT g, x, sum(w) w FROM li GROUP BY g, x),
        |c AS (SELECT g, x, w, sum(w) OVER (PARTITION BY g ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cw FROM bv),
        |t AS (SELECT g, sum(w) tw FROM bv GROUP BY g),
        |p AS (SELECT c.g, x, (cw - w * 0.5) / tw AS p FROM c JOIN t ON c.g = t.g)
        |SELECT g,
        |  CAST(floor(1000000 * (CASE
        |    WHEN max(CASE WHEN p <= 0.25 THEN p END) IS NULL
        |      THEN CAST(min(CASE WHEN p >= 0.25 THEN x END) AS DOUBLE)
        |    WHEN min(CASE WHEN p >= 0.25 THEN p END) IS NULL
        |      THEN CAST(max(CASE WHEN p <= 0.25 THEN x END) AS DOUBLE)
        |    WHEN min(CASE WHEN p >= 0.25 THEN p END) = max(CASE WHEN p <= 0.25 THEN p END)
        |      THEN CAST(max(CASE WHEN p <= 0.25 THEN x END) AS DOUBLE)
        |    ELSE max(CASE WHEN p <= 0.25 THEN x END)
        |      + (min(CASE WHEN p >= 0.25 THEN x END) - max(CASE WHEN p <= 0.25 THEN x END))
        |        * (0.25 - max(CASE WHEN p <= 0.25 THEN p END))
        |        / (min(CASE WHEN p >= 0.25 THEN p END) - max(CASE WHEN p <= 0.25 THEN p END))
        |  END)) AS BIGINT) AS wq25_ppm,
        |  CAST(floor(1000000 * (CASE
        |    WHEN max(CASE WHEN p <= 0.5 THEN p END) IS NULL
        |      THEN CAST(min(CASE WHEN p >= 0.5 THEN x END) AS DOUBLE)
        |    WHEN min(CASE WHEN p >= 0.5 THEN p END) IS NULL
        |      THEN CAST(max(CASE WHEN p <= 0.5 THEN x END) AS DOUBLE)
        |    WHEN min(CASE WHEN p >= 0.5 THEN p END) = max(CASE WHEN p <= 0.5 THEN p END)
        |      THEN CAST(max(CASE WHEN p <= 0.5 THEN x END) AS DOUBLE)
        |    ELSE max(CASE WHEN p <= 0.5 THEN x END)
        |      + (min(CASE WHEN p >= 0.5 THEN x END) - max(CASE WHEN p <= 0.5 THEN x END))
        |        * (0.5 - max(CASE WHEN p <= 0.5 THEN p END))
        |        / (min(CASE WHEN p >= 0.5 THEN p END) - max(CASE WHEN p <= 0.5 THEN p END))
        |  END)) AS BIGINT) AS wq50_ppm,
        |  CAST(floor(1000000 * (CASE
        |    WHEN max(CASE WHEN p <= 0.75 THEN p END) IS NULL
        |      THEN CAST(min(CASE WHEN p >= 0.75 THEN x END) AS DOUBLE)
        |    WHEN min(CASE WHEN p >= 0.75 THEN p END) IS NULL
        |      THEN CAST(max(CASE WHEN p <= 0.75 THEN x END) AS DOUBLE)
        |    WHEN min(CASE WHEN p >= 0.75 THEN p END) = max(CASE WHEN p <= 0.75 THEN p END)
        |      THEN CAST(max(CASE WHEN p <= 0.75 THEN x END) AS DOUBLE)
        |    ELSE max(CASE WHEN p <= 0.75 THEN x END)
        |      + (min(CASE WHEN p >= 0.75 THEN x END) - max(CASE WHEN p <= 0.75 THEN x END))
        |        * (0.75 - max(CASE WHEN p <= 0.75 THEN p END))
        |        / (min(CASE WHEN p >= 0.75 THEN p END) - max(CASE WHEN p <= 0.75 THEN p END))
        |  END)) AS BIGINT) AS wq75_ppm
        |FROM p GROUP BY g
        |ORDER BY g NULLS FIRST, wq25_ppm NULLS FIRST, wq50_ppm NULLS FIRST,
        |  wq75_ppm NULLS FIRST""".stripMargin,
    "q_linreg_multi" ->
      """WITH m AS (SELECT
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x1*x1) AS DOUBLE) AS s11, CAST(sum(x1*x2) AS DOUBLE) AS s12,
        |    CAST(sum(x2*x2) AS DOUBLE) AS s22,
        |    CAST(sum(x1*y) AS DOUBLE) AS s1y, CAST(sum(x2*y) AS DOUBLE) AS s2y
        |  FROM (SELECT
        |      CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
        |      CAST(l_quantity AS BIGINT) AS x1,
        |      CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2
        |    FROM lineitem))
        |SELECT
        |  CAST(floor((sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y))
        |    / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))
        |    * 1000000) AS BIGINT) AS intercept_ppm,
        |  CAST(floor((n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))
        |    / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))
        |    * 1000000) AS BIGINT) AS coef_qty_ppm,
        |  CAST(floor((n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))
        |    / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))
        |    * 1000000) AS BIGINT) AS coef_disc_ppm
        |FROM m""".stripMargin,
    "q_quantile_dd" -> {
      // one sketch column rebuilt relationally: bucket -> count ->
      // running count -> first bucket past rank floor(q*(n-1)) -> the
      // gamma-midpoint. gamma = 1.01/0.99 (alpha = 0.01), same doubles.
      def dd(x: String, q: String) =
        s"""(SELECT round(2*pow(1.01/0.99, i)/(1.01/0.99 + 1), 9) FROM (
           |    SELECT i, sum(cnt) OVER (ORDER BY i) AS cum,
           |           sum(cnt) OVER () AS tot
           |    FROM (SELECT CAST(ceil(ln($x)/ln(1.01/0.99)) AS INT) AS i,
           |                 count(*) AS cnt
           |          FROM lineitem li2 WHERE li2.l_returnflag = g.l_returnflag
           |            AND $x > 0 GROUP BY 1))
           |  WHERE cum > floor($q*(tot-1)) ORDER BY i LIMIT 1)""".stripMargin
      s"""SELECT l_returnflag,
         |  ${dd("l_quantity", "0.5")} AS dd_p50,
         |  ${dd("l_quantity", "0.9")} AS dd_p90,
         |  ${dd("l_extendedprice", "0.99")} AS dd_p99_price,
         |  count(*) AS n
         |FROM lineitem g GROUP BY l_returnflag
         |ORDER BY l_returnflag NULLS FIRST, dd_p50 NULLS FIRST,
         |  dd_p90 NULLS FIRST, dd_p99_price NULLS FIRST, n NULLS FIRST""".stripMargin
    }
  )
}
