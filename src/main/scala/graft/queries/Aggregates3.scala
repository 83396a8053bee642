package graft.queries

import graft.core.Tables
import graft.ops.Ops
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregate/stat-test tail, batch 3: studentTTest, meanZTest,
  * minMap/maxMap, seriesOutliersDetectTukey, arrayAUC,
  * groupArrayMovingSum, approximate-quantile accuracy (reference:
  * src/AggregateFunctions/AggregateFunctionTTest.h, MeanZTest.cpp,
  * AggregateFunctionSumMap.cpp min/max variants,
  * seriesOutliersDetectTukey.cpp, AggregateFunctionAUC ...,
  * AggregateFunctionMovingSum, QuantileTDigest.h).
  */
object Aggregates3 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // Two-sample pooled-variance Student t (A vs R return flags).
    "q_student_ttest" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_returnflag").isin("A", "R"))
      val g = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"), avg(col("l_quantity")).as("m"),
        var_samp(col("l_quantity")).as("v"))
      val a = g.filter(col("l_returnflag") === "A")
        .select(col("n").as("na"), col("m").as("ma"), col("v").as("va"))
      val b = g.filter(col("l_returnflag") === "R")
        .select(col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
      val j = a.crossJoin(b)
      val sp2 = ((col("na") - 1) * col("va") + (col("nb") - 1) * col("vb")) /
        (col("na") + col("nb") - 2)
      j.select(
        round((col("ma") - col("mb")) /
          sqrt(sp2 * (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 6).as("t_stat"),
        (col("na") + col("nb") - 2).as("df"))
    },

    // One-sample mean z-test against mu0 = 25.5.
    "q_mean_ztest" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      li.agg(count(lit(1)).as("n"), avg(col("l_quantity")).as("m"),
          stddev_pop(col("l_quantity")).as("sd"))
        .select(
          round((col("m") - 25.5) / (col("sd") / sqrt(col("n"))), 6).as("z_stat"),
          col("n"))
    },

    // minMap / maxMap (reference AggregateFunctionSumMap min/max
    // variants) — keyed extrema serialized like q_sum_map.
    "q_min_max_map" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val inner = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(min(col("l_quantity")).cast("long").as("mn"),
          max(col("l_quantity")).cast("long").as("mx"))
      ordered(inner.groupBy(col("l_returnflag"))
        .agg(
          concat_ws(",", sort_array(collect_list(
            concat(col("l_linestatus"), lit(":"), col("mn").cast("string"))))).as("min_map"),
          concat_ws(",", sort_array(collect_list(
            concat(col("l_linestatus"), lit(":"), col("mx").cast("string"))))).as("max_map")))
    },

    // seriesOutliersDetectTukey: per-user 1.5*IQR fences on event values.
    "q_series_outliers" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val fences = e.groupBy(col("user_id").as("uid"))
        .agg(percentile(col("value"), lit(0.25)).as("q1"),
          percentile(col("value"), lit(0.75)).as("q3"))
      val j = e.join(fences, e("user_id") === col("uid")).drop("uid")
      val iqr = col("q3") - col("q1")
      ordered(j.select(col("user_id"), col("event_id"), col("value"),
        (col("value") < col("q1") - iqr * 1.5 ||
          col("value") > col("q3") + iqr * 1.5).as("is_outlier")))
    },

    // arrayAUC analog: AUC of `value` as a score for the 'purchase'
    // label, via tie-aware midranks (same scale-safe running-total
    // machinery as Mann-Whitney).
    "q_auc" -> { (s, dir) =>
      val e = T(s, dir)("events")
        .select(col("value").as("x"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val byVal = e.groupBy(col("x")).agg(
        sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn"))
      val cum = Ops.runningTotalExclusive(byVal, col("x"),
        col("np") + col("nn"), "cum_before")
      val ranked = cum.withColumn("midrank",
        col("cum_before") + (col("np") + col("nn") + 1) / 2.0)
      val tot = byVal.agg(sum(col("np")).as("tp"), sum(col("nn")).as("tn"))
      ranked.agg(sum(col("midrank") * col("np")).as("rank_sum_pos"))
        .crossJoin(broadcast(tot))
        .select(round((col("rank_sum_pos") - col("tp") * (col("tp") + 1) / 2.0) /
          (col("tp") * col("tn")), 9).as("auc"),
          col("tp"), col("tn"))
    },

    // groupArrayMovingSum(3): per-user array of 3-row sliding sums in
    // (ts, event_id) order.
    "q_moving_sum" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      // Per-row scalar output (the driver's comparator can't sort ARRAY
      // columns); scaled-long emission is bit-exact where round() is not.
      val withM = e.withColumn("msum", sum(col("value")).over(w))
      ordered(withM.select(col("user_id"), col("event_id"),
        floor(col("msum") * 1e6 + 0.5).as("ms6")))
    },

    // groupBitmapOr / groupBitmapAnd cardinalities (reference
    // AggregateFunctionGroupBitmap — RoaringBitmap there; the set
    // SEMANTICS expressed declaratively here): per event type over the
    // first week of Jan 2024, |union of daily user sets| and
    // |intersection of daily user sets| (= users active every day).
    "q_bitmap_ops" -> { (s, dir) =>
      val e = T(s, dir)("events")
        .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
        .select(col("event_type"), col("user_id"),
          date_trunc("day", col("ts")).as("day"))
      val nDays = e.select(col("event_type").as("et"), col("day")).distinct()
        .groupBy(col("et")).agg(countDistinct(col("day")).as("nd"))
      val perUser = e.select(col("event_type"), col("user_id"), col("day")).distinct()
        .groupBy(col("event_type"), col("user_id"))
        .agg(countDistinct(col("day")).as("days_active"))
      ordered(perUser.join(nDays, perUser("event_type") === col("et"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("bitmap_or_card"),
          sum(when(col("days_active") === col("nd"), 1).otherwise(0)).as("bitmap_and_card")))
    },

    // Approximate quantile accuracy contract (reference QuantileTDigest):
    // percentile_approx must land within 2% relative of the exact median.
    "q_quantile_approx" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"), lit(0.5)).as("exact_med"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_med"))
        .select(col("l_returnflag"), round(col("exact_med"), 6).as("exact_med"),
          (abs(col("approx_med") - col("exact_med")) / col("exact_med") <= 0.02)
            .as("approx_within_2pct")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_student_ttest" ->
      """WITH g AS (SELECT l_returnflag,
        |    cast(count(*) AS BIGINT) n, avg(l_quantity) m, var_samp(l_quantity) v
        |  FROM lineitem WHERE l_returnflag IN ('A','R') GROUP BY 1),
        |a AS (SELECT n na, m ma, v va FROM g WHERE l_returnflag = 'A'),
        |b AS (SELECT n nb, m mb, v vb FROM g WHERE l_returnflag = 'R')
        |SELECT round((ma - mb) / sqrt((((na-1)*va + (nb-1)*vb) / (na+nb-2))
        |    * (1.0/na + 1.0/nb)), 6) AS t_stat,
        |  na + nb - 2 AS df
        |FROM a CROSS JOIN b""".stripMargin,
    "q_mean_ztest" ->
      """SELECT round((avg(l_quantity) - 25.5)
        |    / (stddev_pop(l_quantity) / sqrt(count(*))), 6) AS z_stat,
        |  cast(count(*) AS BIGINT) AS n
        |FROM lineitem""".stripMargin,
    "q_min_max_map" ->
      """WITH im AS (SELECT l_returnflag, l_linestatus,
        |    cast(min(l_quantity) AS BIGINT) mn, cast(max(l_quantity) AS BIGINT) mx
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  string_agg(l_linestatus || ':' || mn, ',' ORDER BY l_linestatus || ':' || mn) AS min_map,
        |  string_agg(l_linestatus || ':' || mx, ',' ORDER BY l_linestatus || ':' || mx) AS max_map
        |FROM im GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q_series_outliers" ->
      """WITH f AS (SELECT user_id,
        |    quantile_cont(value, 0.25) q1, quantile_cont(value, 0.75) q3
        |  FROM events GROUP BY user_id)
        |SELECT e.user_id AS user_id, event_id, value,
        |  (value < q1 - 1.5*(q3-q1) OR value > q3 + 1.5*(q3-q1)) AS is_outlier
        |FROM events e JOIN f ON e.user_id = f.user_id
        |ORDER BY user_id NULLS FIRST, event_id NULLS FIRST, value NULLS FIRST, is_outlier NULLS FIRST""".stripMargin,
    "q_auc" ->
      """WITH e AS (SELECT value x,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END pos
        |  FROM events),
        |bv AS (SELECT x, cast(sum(pos) AS BIGINT) np,
        |    cast(sum(1 - pos) AS BIGINT) nn FROM e GROUP BY x),
        |c AS (SELECT x, np, nn,
        |    coalesce(sum(np + nn) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_before
        |  FROM bv),
        |t AS (SELECT cast(sum(np) AS BIGINT) tp, cast(sum(nn) AS BIGINT) tn FROM bv)
        |SELECT round((sum((cum_before + (np + nn + 1) / 2.0) * np)
        |    - tp * (tp + 1) / 2.0) / (tp * tn), 9) AS auc, tp, tn
        |FROM c, t GROUP BY tp, tn""".stripMargin,
    "q_moving_sum" ->
      """WITH m AS (SELECT user_id, event_id,
        |    sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS msum
        |  FROM events)
        |SELECT user_id, event_id, CAST(floor(msum * 1e6 + 0.5) AS BIGINT) AS ms6
        |FROM m
        |ORDER BY user_id NULLS FIRST, event_id NULLS FIRST, ms6 NULLS FIRST""".stripMargin,
    "q_bitmap_ops" ->
      """WITH e AS (SELECT event_type, user_id,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08'),
        |nd AS (SELECT event_type, count(DISTINCT day) AS ndays FROM e GROUP BY 1),
        |pu AS (SELECT event_type, user_id, count(DISTINCT day) AS days_active
        |  FROM e GROUP BY 1, 2)
        |SELECT pu.event_type AS event_type,
        |  cast(count(*) AS BIGINT) AS bitmap_or_card,
        |  cast(sum(CASE WHEN days_active = ndays THEN 1 ELSE 0 END) AS BIGINT) AS bitmap_and_card
        |FROM pu JOIN nd ON pu.event_type = nd.event_type
        |GROUP BY pu.event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_quantile_approx" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_med,
        |  true AS approx_within_2pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  )
}
