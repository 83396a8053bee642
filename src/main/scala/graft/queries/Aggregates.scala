package graft.queries

import graft.aggregates.{Funnel, TopK}
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregate-function families beyond the basics (SURVEY.md §2.4):
  * quantiles, heavy hitters (SpaceSaving topK), behavioral aggregates
  * (windowFunnel / retention / sequenceMatch), time-series deltas,
  * group collections, entropy, higher moments, capped distinct.
  */
object Aggregates {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)
  private val MICROS_7D = 7L * 24 * 3600 * 1000000

  val queries: Map[String, Q] = Map(
    // Exact interpolated quantiles (reference quantileExact*; Spark
    // `percentile` == DuckDB `quantile_cont`).
    "q_quantiles" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.25)").as("p25"),
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.75)").as("p75"),
          expr("percentile(l_extendedprice, 0.99)").as("p99"),
          min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx")))
    },

    // topK via SpaceSaving (exact here: capacity >> distinct values).
    "q_topk" -> { (s, dir) =>
      val e = T(s, dir)("events")
      ordered(e.groupBy(col("user_id"))
        .agg(concat_ws(",", TopK.topK(col("event_type"), 3)).as("top3")))
    },

    // topKWeighted: by summed integer weight (exact here — capacity
    // exceeds distinct values).
    "q_topk_weighted" -> { (s, dir) =>
      val e = T(s, dir)("events")
      ordered(e.groupBy(col("user_id"))
        .agg(concat_ws(",", TopK.topKWeighted(col("event_type"),
          floor(col("value")).cast("long"), 3)).as("top3w")))
    },

    // windowFunnel: signup -> click -> purchase within 7 days, per user.
    "q_window_funnel" -> { (s, dir) =>
      val e = T(s, dir)("events")
      ordered(e.groupBy(col("user_id"))
        .agg(Funnel.windowFunnel(unix_micros(col("ts")), col("event_type"),
          MICROS_7D, Seq("signup", "click", "purchase")).as("funnel_level")))
    },

    // retention (reference AggregateFunctionRetention): cond1 ever, then
    // cond1 AND cond_i ever — no ordering requirement.
    "q_retention" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val had = (t: String) => max(when(col("event_type") === t, 1).otherwise(0))
      ordered(e.groupBy(col("user_id"))
        .agg(had("signup").as("r1"),
             (had("signup") * had("click")).as("r2"),
             (had("signup") * had("purchase")).as("r3")))
    },

    // sequenceMatch('(?1).*(?2)'): any signup strictly before any purchase.
    "q_sequence_match" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val tsOf = (t: String) => when(col("event_type") === t, col("ts"))
      ordered(e.groupBy(col("user_id"))
        .agg(min(tsOf("signup")).as("first_signup"),
             max(tsOf("purchase")).as("last_purchase"))
        .select(col("user_id"),
          (col("first_signup").isNotNull && col("last_purchase").isNotNull &&
            col("first_signup") < col("last_purchase")).as("matched")))
    },

    // sequenceCount('(?1).*(?2)') (reference sequenceCount): number of
    // NON-OVERLAPPING signup->purchase chains per user = count of
    // purchases (in time order, i-th) with at least i signups before
    // them (greedy earliest matching).
    "q_sequence_count" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withCums = e
        .withColumn("cum_signup",
          sum(when(col("event_type") === "signup", 1).otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("event_type") === "purchase")
      val wp = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ordered(withCums
        .withColumn("i", row_number().over(wp))
        .groupBy(col("user_id"))
        .agg(sum(when(coalesce(col("cum_signup"), lit(0)) >= col("i"), 1).otherwise(0))
          .cast("long").as("n_chains")))
    },

    // deltaSum (reference AggregateFunctionDeltaSum): sum of positive
    // steps of `value` in event order, per user.
    "q_delta_sum" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ordered(e
        .withColumn("d", col("value") - lag(col("value"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(sum(when(col("d") > 0, col("d")).otherwise(0.0)).as("delta_sum")))
    },

    // groupArray / groupConcat (reference :18-23,71): ordered string agg.
    "q_group_concat" -> { (s, dir) =>
      val n = T(s, dir)("nation")
      ordered(n.groupBy(col("n_regionkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
             count(lit(1)).as("n")))
    },

    // Shannon entropy of the event_type distribution per user (reference
    // AggregateFunctionEntropy) — composed from two hash aggregations.
    "q_entropy" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val counts = e.groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
      val totals = counts.groupBy(col("user_id")).agg(sum(col("c")).as("tot"))
      ordered(counts.join(totals, "user_id")
        .withColumn("p", col("c") / col("tot"))
        .groupBy(col("user_id"))
        .agg((-sum(col("p") * log2(col("p")))).as("entropy")))
    },

    // Higher moments (reference skewPop/kurtPop).
    "q_skew_kurt" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_linestatus"))
        .agg(skewness(col("l_quantity")).as("skew"),
             kurtosis(col("l_quantity")).as("kurt"),
             count(lit(1)).as("n")))
    },

    // uniqUpTo(N) (reference AggregateFunctionUniqUpTo): exact distinct,
    // saturating at N+1 -> reported as N.
    //
    // size(collect_set(..)) instead of two countDistinct columns: Spark
    // plans multi-distinct as Expand (input x2) + two extra exchanges;
    // collect_set partial-aggregates map-side and the whole query is ONE
    // exchange on l_suppkey (r18 plan audit: 3 exchanges + Expand -> 1
    // exchange). Scale posture: groups (suppliers) scale with the data
    // while per-group sets stay data-bounded (parts per supplier,
    // <= 3 flags) — the same bytes the Expand plan shuffled as rows.
    "q_uniq_upto" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_suppkey"))
        .agg(least(size(collect_set(col("l_partkey"))).cast("long"), lit(50L))
               .as("upto50"),
             size(collect_set(col("l_returnflag"))).cast("long").as("nd_flags")))
    },

    // Fixed-width histogram of l_quantity (reference histogram/widthBucket)
    // — bucket index via integer floor, stable across engines.
    "q_histogram" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li
        .withColumn("bucket", floor(col("l_quantity") / 5).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("l_quantity")).as("lo"),
             max(col("l_quantity")).as("hi")))
    },

    // groupBitAnd/Or/Xor (reference :63-64).
    "q_bit_agg" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_returnflag"))
        .agg(bit_and(col("l_orderkey")).as("b_and"),
             bit_or(col("l_orderkey")).as("b_or"),
             bit_xor(col("l_orderkey")).as("b_xor")))
    },

    // bool_and / bool_or (reference groupBitAnd on UInt8 / any/all).
    "q_bool_agg" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      ordered(o.groupBy(col("o_orderstatus"))
        .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
             bool_or(col("o_totalprice") > 400000).as("any_over_400k"),
             count(lit(1)).as("n")))
    },

    // avgWeighted (reference AggregateFunctionAvgWeighted).
    "q_avg_weighted" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_returnflag"))
        .agg((sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")))
          .as("avg_price_weighted")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.75) AS p75,
        |  quantile_cont(l_extendedprice, 0.99) AS p99,
        |  min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q_topk" ->
      """SELECT user_id, string_agg(event_type, ',' ORDER BY c DESC, event_type) AS top3
        |FROM (
        |  SELECT user_id, event_type, count(*) AS c,
        |    row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
        |  FROM events GROUP BY user_id, event_type)
        |WHERE rn <= 3
        |GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, top3 NULLS FIRST""".stripMargin,
    "q_topk_weighted" ->
      """SELECT user_id, string_agg(event_type, ',' ORDER BY w DESC, event_type) AS top3w
        |FROM (
        |  SELECT user_id, event_type, sum(cast(floor(value) AS bigint)) AS w,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY sum(cast(floor(value) AS bigint)) DESC, event_type) AS rn
        |  FROM events GROUP BY user_id, event_type)
        |WHERE rn <= 3
        |GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, top3w NULLS FIRST""".stripMargin,
    "q_window_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id AS user_id,
        |  CASE
        |   WHEN EXISTS (SELECT 1 FROM ev s, ev c, ev p
        |     WHERE s.user_id = u.user_id AND c.user_id = u.user_id AND p.user_id = u.user_id
        |       AND s.event_type = 'signup' AND c.event_type = 'click' AND p.event_type = 'purchase'
        |       AND c.us >= s.us AND p.us >= c.us AND p.us - s.us <= 604800000000) THEN 3
        |   WHEN EXISTS (SELECT 1 FROM ev s, ev c
        |     WHERE s.user_id = u.user_id AND c.user_id = u.user_id
        |       AND s.event_type = 'signup' AND c.event_type = 'click'
        |       AND c.us >= s.us AND c.us - s.us <= 604800000000) THEN 2
        |   WHEN EXISTS (SELECT 1 FROM ev s
        |     WHERE s.user_id = u.user_id AND s.event_type = 'signup') THEN 1
        |   ELSE 0 END AS funnel_level
        |FROM u
        |ORDER BY user_id NULLS FIRST, funnel_level NULLS FIRST""".stripMargin,
    "q_retention" ->
      """SELECT user_id,
        |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
        |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS r2,
        |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r3
        |FROM events GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, r1 NULLS FIRST, r2 NULLS FIRST, r3 NULLS FIRST""".stripMargin,
    "q_sequence_match" ->
      """SELECT user_id,
        |  coalesce(min(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END)
        |    < max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END), false) AS matched
        |FROM events GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, matched NULLS FIRST""".stripMargin,
    "q_sequence_count" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_signup
        |  FROM events),
        |pp AS (SELECT user_id, coalesce(cum_signup, 0) AS cs,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
        |  FROM p WHERE event_type = 'purchase')
        |SELECT user_id,
        |  cast(sum(CASE WHEN cs >= i THEN 1 ELSE 0 END) AS bigint) AS n_chains
        |FROM pp GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, n_chains NULLS FIRST""".stripMargin,
    "q_delta_sum" ->
      """SELECT user_id,
        |  sum(CASE WHEN d > 0 THEN d ELSE 0.0 END) AS delta_sum
        |FROM (
        |  SELECT user_id, value - lag(value, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS d
        |  FROM events)
        |GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, delta_sum NULLS FIRST""".stripMargin,
    "q_group_concat" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey NULLS FIRST, nations NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_entropy" ->
      """SELECT user_id, -sum(p * log2(p)) AS entropy FROM (
        |  SELECT user_id, count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY user_id) AS p
        |  FROM events GROUP BY user_id, event_type)
        |GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, entropy NULLS FIRST""".stripMargin,
    "q_skew_kurt" ->
      """WITH m AS (SELECT l_linestatus, avg(l_quantity) AS mu,
        |    count(*)::DOUBLE AS n FROM lineitem GROUP BY l_linestatus)
        |SELECT l.l_linestatus,
        |  (sum(pow(l_quantity - mu, 3)) / n)
        |    / pow(sum(pow(l_quantity - mu, 2)) / n, 1.5) AS skew,
        |  (sum(pow(l_quantity - mu, 4)) / n)
        |    / pow(sum(pow(l_quantity - mu, 2)) / n, 2) - 3.0 AS kurt,
        |  cast(n AS bigint) AS n
        |FROM lineitem l JOIN m ON l.l_linestatus = m.l_linestatus
        |GROUP BY l.l_linestatus, m.mu, m.n
        |ORDER BY l.l_linestatus NULLS FIRST""".stripMargin,
    "q_uniq_upto" ->
      """SELECT l_suppkey,
        |  least(cast(count(DISTINCT l_partkey) AS bigint), 50) AS upto50,
        |  cast(count(DISTINCT l_returnflag) AS bigint) AS nd_flags
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY l_suppkey NULLS FIRST""".stripMargin,
    "q_histogram" ->
      """SELECT cast(floor(l_quantity / 5) AS int) AS bucket, count(*) AS n,
        |  min(l_quantity) AS lo, max(l_quantity) AS hi
        |FROM lineitem GROUP BY 1
        |ORDER BY bucket NULLS FIRST, n NULLS FIRST, lo NULLS FIRST, hi NULLS FIRST""".stripMargin,
    "q_bit_agg" ->
      """SELECT l_returnflag,
        |  bit_and(l_orderkey) AS b_and,
        |  bit_or(l_orderkey) AS b_or,
        |  bit_xor(l_orderkey) AS b_xor
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q_bool_agg" ->
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_totalprice > 400000) AS any_over_400k,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST""".stripMargin,
    "q_avg_weighted" ->
      """SELECT l_returnflag,
        |  sum(l_extendedprice * l_quantity) / sum(l_quantity) AS avg_price_weighted
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  )
}
