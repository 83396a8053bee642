package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregate tail, batch 6: one-way ANOVA, categorical information value
  * and bias-corrected Cramér's V (reference:
  * src/AggregateFunctions/AggregateFunctionAnalysisOfVariance.cpp,
  * AggregateFunctionCategoricalInformationValue.cpp,
  * AggregateFunctionCramersVBiasCorrected — registerAggregateFunctions
  * .cpp:79-91). All three are two-pass keyed aggregations over tiny
  * group-count tables — shuffle only on the (few-valued) category keys.
  */
object Aggregates6 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // analysisOfVariance(value, group): one-way F statistic over event
    // values grouped by type. F = (SSB/(k-1)) / (SSW/(n-k)); SSB/SSW from
    // per-group (n, mean) + the grand mean — no raw-row second pass.
    "q_anova" -> { (s, dir) =>
      val e = T(s, dir)("events").select(col("event_type").as("g"), col("value").as("x"))
      val per = e.groupBy(col("g")).agg(count(lit(1)).as("ni"), avg(col("x")).as("mi"),
        var_pop(col("x")).as("vi"))
      val grand = e.agg(count(lit(1)).as("n"), avg(col("x")).as("gm"))
      per.crossJoin(broadcast(grand))
        .agg(
          sum(col("ni") * pow(col("mi") - col("gm"), 2)).as("ssb"),
          sum(col("ni") * col("vi")).as("ssw"),
          countDistinct(col("g")).as("k"), max(col("n")).as("nn"))
        .select(
          round((col("ssb") / (col("k") - 1)) / (col("ssw") / (col("nn") - col("k"))), 6)
            .as("f_stat"),
          (col("k") - 1).as("df_between"),
          (col("nn") - col("k")).as("df_within"))
    },

    // categoricalInformationValue(cat -> converted?): per order-priority
    // category, (good_i/G - bad_i/B) * ln((good_i/G)/(bad_i/B)); good =
    // fulfilled orders. Output per-category WoE terms AND the total IV.
    "q_categorical_iv" -> { (s, dir) =>
      val o = T(s, dir)("orders").select(col("o_orderpriority").as("cat"),
        when(col("o_orderstatus") === "F", 1).otherwise(0).as("good"))
      val per = o.groupBy(col("cat")).agg(
        sum(col("good")).as("gi"), sum(lit(1) - col("good")).as("bi"))
      val tot = per.agg(sum(col("gi")).as("gt"), sum(col("bi")).as("bt"))
      val gf = col("gi").cast("double") / col("gt")
      val bf = col("bi").cast("double") / col("bt")
      ordered(per.crossJoin(broadcast(tot))
        .select(col("cat"), round((gf - bf) * log(gf / bf), 9).as("woe_term")))
    },

    // windowFunnel strict modes: strict_order (any intervening event
    // interrupts — so the matched chain is consecutive in the per-user
    // sequence, which is exactly what the lead()-based oracle checks)
    // and strict_increase (strictly increasing timestamps).
    "q_window_funnel_strict" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val week = 604800000000L
      val steps = Seq("view", "click", "purchase")
      ordered(e.groupBy(col("user_id")).agg(
        graft.aggregates.Funnel.windowFunnelModes(
          unix_micros(col("ts")), col("event_id"), col("event_type"),
          week, steps, Set("strict_order")).as("strict_order_level"),
        graft.aggregates.Funnel.windowFunnelModes(
          unix_micros(col("ts")), col("event_id"), col("event_type"),
          week, steps, Set("strict_increase")).as("strict_increase_level")))
    },

    // cramersVBiasCorrected (Bergsma 2013): phi2' = max(0, phi2 -
    // (r-1)(c-1)/(n-1)), r' = r - (r-1)^2/(n-1), c' likewise,
    // V = sqrt(phi2' / min(r'-1, c'-1)). Same contingency machinery as
    // q_cramers_theils, corrected.
    "q_cramers_bias_corrected" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val cells = li.groupBy(col("l_returnflag").as("a"), col("l_linestatus").as("b"))
        .agg(count(lit(1)).as("nij"))
      val ra = cells.groupBy(col("a")).agg(sum(col("nij")).as("ra"))
      val cb = cells.groupBy(col("b")).agg(sum(col("nij")).as("cb"))
      val tot = cells.agg(sum(col("nij")).as("n"), countDistinct(col("a")).as("r"))
      val nb = cells.agg(countDistinct(col("b")).as("c"))
      val e = col("ra") * col("cb") / col("n")
      val agg0 = cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
        .crossJoin(broadcast(tot)).crossJoin(broadcast(nb))
        .agg(sum(pow(col("nij") - e, 2) / e).as("chi2"),
          max(col("n")).as("nn"), max(col("r")).as("rr"), max(col("c")).as("cc"))
      val phi2 = col("chi2") / col("nn")
      val phi2c = greatest(lit(0.0),
        phi2 - (col("rr") - 1) * (col("cc") - 1) / (col("nn") - 1))
      val rc = col("rr") - pow(col("rr") - 1, 2) / (col("nn") - 1)
      val cc2 = col("cc") - pow(col("cc") - 1, 2) / (col("nn") - 1)
      agg0.select(
        round(sqrt(phi2c / least(rc - 1, cc2 - 1)), 9).as("cramers_v_corrected"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_anova" ->
      """WITH e AS (SELECT event_type g, value x FROM events),
        |per AS (SELECT g, count(*) ni, avg(x) mi, var_pop(x) vi FROM e GROUP BY g),
        |grand AS (SELECT count(*) n, avg(x) gm FROM e),
        |agg AS (SELECT sum(ni * pow(mi - gm, 2)) ssb, sum(ni * vi) ssw,
        |    count(DISTINCT g) k, max(n) nn
        |  FROM per CROSS JOIN grand)
        |SELECT round((ssb / (k - 1)) / (ssw / (nn - k)), 6) AS f_stat,
        |  cast(k - 1 AS BIGINT) AS df_between,
        |  cast(nn - k AS BIGINT) AS df_within
        |FROM agg""".stripMargin,
    "q_categorical_iv" ->
      """WITH o AS (SELECT o_orderpriority cat,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END good FROM orders),
        |per AS (SELECT cat, cast(sum(good) AS BIGINT) gi,
        |    cast(sum(1 - good) AS BIGINT) bi FROM o GROUP BY cat),
        |t AS (SELECT cast(sum(gi) AS BIGINT) gt, cast(sum(bi) AS BIGINT) bt FROM per)
        |SELECT cat,
        |  round((CAST(gi AS DOUBLE)/gt - CAST(bi AS DOUBLE)/bt)
        |    * ln((CAST(gi AS DOUBLE)/gt) / (CAST(bi AS DOUBLE)/bt)), 9) AS woe_term
        |FROM per CROSS JOIN t
        |ORDER BY cat NULLS FIRST, woe_term NULLS FIRST""".stripMargin,
    "q_window_funnel_strict" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |seq AS (SELECT user_id, event_type, us,
        |    lead(event_type, 1) OVER w AS e1, lead(us, 1) OVER w AS us1,
        |    lead(event_type, 2) OVER w AS e2, lead(us, 2) OVER w AS us2
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id AS user_id,
        |  CASE
        |    WHEN EXISTS (SELECT 1 FROM seq s WHERE s.user_id = u.user_id
        |      AND s.event_type = 'view' AND s.e1 = 'click' AND s.e2 = 'purchase'
        |      AND s.us2 - s.us <= 604800000000) THEN 3
        |    WHEN EXISTS (SELECT 1 FROM seq s WHERE s.user_id = u.user_id
        |      AND s.event_type = 'view' AND s.e1 = 'click'
        |      AND s.us1 - s.us <= 604800000000) THEN 2
        |    WHEN EXISTS (SELECT 1 FROM ev s WHERE s.user_id = u.user_id
        |      AND s.event_type = 'view') THEN 1
        |    ELSE 0 END AS strict_order_level,
        |  CASE
        |    WHEN EXISTS (SELECT 1 FROM ev v, ev c, ev p
        |      WHERE v.user_id = u.user_id AND c.user_id = u.user_id
        |        AND p.user_id = u.user_id
        |        AND v.event_type = 'view' AND c.event_type = 'click'
        |        AND p.event_type = 'purchase'
        |        AND c.us > v.us AND p.us > c.us
        |        AND p.us - v.us <= 604800000000) THEN 3
        |    WHEN EXISTS (SELECT 1 FROM ev v, ev c
        |      WHERE v.user_id = u.user_id AND c.user_id = u.user_id
        |        AND v.event_type = 'view' AND c.event_type = 'click'
        |        AND c.us > v.us AND c.us - v.us <= 604800000000) THEN 2
        |    WHEN EXISTS (SELECT 1 FROM ev s WHERE s.user_id = u.user_id
        |      AND s.event_type = 'view') THEN 1
        |    ELSE 0 END AS strict_increase_level
        |FROM u
        |ORDER BY user_id NULLS FIRST, strict_order_level NULLS FIRST,
        |  strict_increase_level NULLS FIRST""".stripMargin,
    "q_cramers_bias_corrected" ->
      """WITH cells AS (SELECT l_returnflag a, l_linestatus b, count(*) nij
        |  FROM lineitem GROUP BY 1, 2),
        |ra AS (SELECT a, cast(sum(nij) AS BIGINT) ra FROM cells GROUP BY a),
        |cb AS (SELECT b, cast(sum(nij) AS BIGINT) cb FROM cells GROUP BY b),
        |t AS (SELECT cast(sum(nij) AS BIGINT) n, count(DISTINCT a) r,
        |    count(DISTINCT b) c FROM cells),
        |agg AS (SELECT
        |    sum(pow(nij - CAST(ra AS DOUBLE)*cb/n, 2) / (CAST(ra AS DOUBLE)*cb/n)) chi2,
        |    max(n) nn, max(r) rr, max(c) cc
        |  FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN t)
        |SELECT round(sqrt(
        |    greatest(0.0, chi2/nn - (rr-1.0)*(cc-1.0)/(nn-1))
        |    / least(rr - pow(rr-1.0, 2)/(nn-1) - 1, cc - pow(cc-1.0, 2)/(nn-1) - 1)
        |  ), 9) AS cramers_v_corrected
        |FROM agg""".stripMargin
  )
}
