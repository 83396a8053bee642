package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregate tail, batch 5: rank statistics, categorical association,
  * regression, weighted quantiles, sweep-line argmax and decayed averages
  * (reference: src/AggregateFunctions/AggregateFunctionRankCorrelation.h,
  * registerAggregateFunctions.cpp `contingency`/`simpleLinearRegression`,
  * AggregateFunctionQuantile.cpp quantileExactWeighted,
  * AggregateFunctionMaxIntersections.h (position variant),
  * ExponentialTimeDecayedAvg in WindowFunctions.cpp).
  *
  * All shapes are shuffle-minimal: per-group windows (never global),
  * broadcast joins for the per-group totals, map-side expression math.
  */
object Aggregates5 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // rankCorr: Spearman rank correlation = Pearson corr of midranks.
    // Midrank for ties = (#rows < v) + (ties + 1)/2 — identical values on
    // both engines, then corr, rounded 6.
    //
    // Midranks are computed DIRECTLY on the fact rows with RANGE-frame
    // windows over value buckets (ties share a bucket by construction):
    // bucket-local (#rows <= v) and (#rows = v) come from two frames of
    // one window sort, the cross-bucket offset is a tiny per-(g, bucket)
    // count table broadcast back. No per-group global window (buckets
    // keep partitions fine-grained at any scale), no groupBy(g, v)
    // distinct-value table, and no 600k-row broadcast of a midrank
    // table — the previous join-back formulation paid one extra shuffle
    // plus a driver-sized broadcast per rank column.
    "q_rank_corr" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
        .select(col("l_returnflag").as("g"), col("l_quantity").as("x"),
          col("l_extendedprice").as("y"))
      // The per-(g, bucket) offset tables depend ONLY on the base
      // relation's (g, bucket(v)) counts — computing them from the
      // PREVIOUS midrank stage (the old nested formulation) embedded the
      // whole level-1 window+join chain inside level-2's count aggregate
      // and doubled the plan to 32 exchanges (r18 plan audit). Built
      // from `li` directly, each offset table is an independent tiny
      // subtree and the main chain is scan -> window(x) -> bcast join ->
      // window(y) -> bcast join -> agg.
      def offsets(bucket: Column): DataFrame = {
        val tots = li.groupBy(col("g").as("__g"), bucket.cast("long").as("__p"))
          .agg(count(lit(1)).as("__n"))
        tots.as("a")
          .join(tots.as("b"),
            col("a.__g") === col("b.__g") && col("b.__p") < col("a.__p"), "left")
          .groupBy(col("a.__g").as("__g"), col("a.__p").as("__p"))
          .agg(sum(col("b.__n")).as("__off"))
      }
      def withMidrank(df: DataFrame, v: String, out: String,
                      bucket: Column, offs: DataFrame): DataFrame = {
        val pid = s"__pid_$v"
        val withPid = df.withColumn(pid, bucket.cast("long"))
        val wLeq = Window.partitionBy(col("g"), col(pid)).orderBy(col(v))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val wEq = Window.partitionBy(col("g"), col(pid)).orderBy(col(v))
          .rangeBetween(Window.currentRow, Window.currentRow)
        val local = withPid
          .withColumn("__leq", count(lit(1)).over(wLeq))
          .withColumn("__eq", count(lit(1)).over(wEq))
        local.join(broadcast(offs),
            col("g") === col("__g") && col(pid) === col("__p"))
          .withColumn(out,
            (coalesce(col("__off"), lit(0L)) + col("__leq") - col("__eq") +
              (col("__eq") + 1) / 2.0))
          .drop("__g", "__p", "__off", "__leq", "__eq", pid)
      }
      val ranked = withMidrank(
        withMidrank(li, "x", "mrx", floor(col("x") / 2),
          offsets(floor(col("x") / 2))),
        "y", "mry", floor(col("y") / 2000),
        offsets(floor(col("y") / 2000)))
      ordered(ranked.groupBy(col("g"))
        .agg(round(corr(col("mrx"), col("mry")), 6).as("rank_corr")))
    },

    // contingency coefficient sqrt(chi2 / (chi2 + n)) over the
    // (o_orderstatus, o_orderpriority) table — same chi2 machinery as
    // cramersV (q_cramers_theils) on a different pair.
    "q_contingency" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      val cells = o.groupBy(col("o_orderstatus").as("a"), col("o_orderpriority").as("b"))
        .agg(count(lit(1)).as("nij"))
      val ra = cells.groupBy(col("a")).agg(sum(col("nij")).as("ra"))
      val cb = cells.groupBy(col("b")).agg(sum(col("nij")).as("cb"))
      val tot = cells.agg(sum(col("nij")).as("n"))
      val e = col("ra") * col("cb") / col("n")
      cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
        .crossJoin(broadcast(tot))
        .agg(sum(pow(col("nij") - e, 2) / e).as("chi2"), max(col("n")).as("nn"))
        .select(round(sqrt(col("chi2") / (col("chi2") + col("nn"))), 9)
          .as("contingency"))
    },

    // simpleLinearRegression(x, y) -> (slope, intercept) per event type:
    // value regressed on hours since 2024-01-01. Closed form
    // covar_pop/var_pop on BOTH engines (not regr_* — pins the numerics).
    "q_simple_linreg" -> { (s, dir) =>
      val e = T(s, dir)("events")
        .select(col("event_type"),
          ((unix_micros(col("ts")) - 1704067200000000L) / 3.6e9).as("x"),
          col("value").as("y"))
      val fit = e.groupBy(col("event_type")).agg(
        covar_pop(col("x"), col("y")).as("cxy"),
        var_pop(col("x")).as("vx"),
        avg(col("x")).as("mx"), avg(col("y")).as("my"))
      ordered(fit.select(col("event_type"),
        round(col("cxy") / col("vx"), 6).as("slope"),
        round(col("my") - col("cxy") / col("vx") * col("mx"), 6).as("intercept")))
    },

    // quantileExactWeighted(w)(x, q): per return flag, the smallest price
    // whose cumulative quantity-weight reaches q * totalWeight, for
    // q in {0.25, 0.5, 0.75}. Exact: integer weights, binary-exact q.
    // Cumulative weights come from a RANGE-frame window over price
    // buckets directly on the fact rows (a RANGE frame gives every tied
    // value the full tie weight, so no distinct-value groupBy is needed)
    // plus the tiny cross-bucket offset broadcast — one shuffle fewer
    // than the previous groupBy(g, x) + running-total formulation, and
    // never a per-group global window.
    "q_quantile_exact_weighted" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"),
          floor(col("l_quantity")).cast("long").as("w"))
      val withPid = li.withColumn("__pid", floor(col("x") / 2000).cast("long"))
      val wCum = Window.partitionBy(col("g"), col("__pid")).orderBy(col("x"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val local = withPid.withColumn("__cwl", sum(col("w")).over(wCum))
      val tots = withPid.groupBy(col("g").as("__g"), col("__pid").as("__p"))
        .agg(sum(col("w")).as("__n"))
      val offs = tots.as("a")
        .join(tots.as("b"),
          col("a.__g") === col("b.__g") && col("b.__p") < col("a.__p"), "left")
        .groupBy(col("a.__g").as("__g"), col("a.__p").as("__p"))
        .agg(sum(col("b.__n")).as("__off"))
      val tot = withPid.groupBy(col("g").as("g2")).agg(sum(col("w")).as("tw"))
      val cum = local.join(broadcast(offs),
          col("g") === col("__g") && col("__pid") === col("__p"))
        .withColumn("cw", coalesce(col("__off"), lit(0L)) + col("__cwl"))
      ordered(cum.join(broadcast(tot), col("g") === col("g2"))
        .groupBy(col("g"))
        .agg(
          min(when(col("cw") >= col("tw") * 0.25, col("x"))).as("wq25"),
          min(when(col("cw") >= col("tw") * 0.5, col("x"))).as("wq50"),
          min(when(col("cw") >= col("tw") * 0.75, col("x"))).as("wq75")))
    },

    // maxIntersectionsPosition: the earliest sweep position where the
    // per-user open-interval count peaks (companion to
    // q_max_intersections — same one-hour event intervals).
    "q_max_intersections_pos" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val hourUs = 3600L * 1000000
      val pts = e.select(col("user_id"), unix_micros(col("ts")).as("p"), lit(1).as("d"))
        .unionByName(e.select(col("user_id"),
          (unix_micros(col("ts")) + hourUs).as("p"), lit(-1).as("d")))
      val sweep = Window.partitionBy(col("user_id")).orderBy(col("p"), col("d"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val open = pts.withColumn("open", sum(col("d")).over(sweep))
      val mx = open.groupBy(col("user_id").as("u2")).agg(max(col("open")).as("mx"))
      ordered(open.join(broadcast(mx), col("user_id") === col("u2"))
        .filter(col("open") === col("mx"))
        .groupBy(col("user_id"))
        .agg(min(col("p")).as("peak_pos"), max(col("mx")).cast("int").as("max_open")))
    },

    // exponentialTimeDecayedAvg(tau=24h): running decayed average of
    // event value per user, order-free form — the e^{-t_cur/tau} factor
    // cancels in the ratio, so both numerator and denominator are plain
    // running sums of e^{t_i/tau}-scaled terms (same trick as
    // q_exp_decay_sum; t normalized to hours since 2024-01-01 so the
    // exponentials stay in range).
    "q_exp_decay_avg" -> { (s, dir) =>
      val e = T(s, dir)("events")
        .select(col("user_id"), col("event_id"),
          ((unix_micros(col("ts")) - 1704067200000000L) / 3.6e9).as("t"),
          col("value").as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val scaled = e.withColumn("num", col("v") * exp(col("t") / 24.0))
        .withColumn("den", exp(col("t") / 24.0))
      ordered(scaled
        .withColumn("decayed_avg",
          round(sum(col("num")).over(w) / sum(col("den")).over(w), 6))
        .select(col("user_id"), col("event_id"), col("decayed_avg")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_rank_corr" ->
      """WITH r AS (SELECT l_returnflag g,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0 AS mrx,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |      + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0 AS mry
        |  FROM lineitem)
        |SELECT g, round(corr(mrx, mry), 6) AS rank_corr
        |FROM r GROUP BY g
        |ORDER BY g NULLS FIRST, rank_corr NULLS FIRST""".stripMargin,
    "q_contingency" ->
      """WITH cells AS (SELECT o_orderstatus a, o_orderpriority b, count(*) nij
        |  FROM orders GROUP BY 1, 2),
        |ra AS (SELECT a, cast(sum(nij) AS BIGINT) ra FROM cells GROUP BY a),
        |cb AS (SELECT b, cast(sum(nij) AS BIGINT) cb FROM cells GROUP BY b),
        |t AS (SELECT cast(sum(nij) AS BIGINT) n FROM cells),
        |agg AS (SELECT
        |    sum(pow(nij - CAST(ra AS DOUBLE)*cb/n, 2) / (CAST(ra AS DOUBLE)*cb/n)) chi2,
        |    max(n) nn
        |  FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN t)
        |SELECT round(sqrt(chi2 / (chi2 + nn)), 9) AS contingency FROM agg""".stripMargin,
    "q_simple_linreg" ->
      """WITH e AS (SELECT event_type,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000) / 3.6e9 AS x,
        |    value AS y
        |  FROM events),
        |f AS (SELECT event_type, covar_pop(x, y) cxy, var_pop(x) vx,
        |    avg(x) mx, avg(y) my
        |  FROM e GROUP BY event_type)
        |SELECT event_type, round(cxy / vx, 6) AS slope,
        |  round(my - cxy / vx * mx, 6) AS intercept
        |FROM f
        |ORDER BY event_type NULLS FIRST, slope NULLS FIRST, intercept NULLS FIRST""".stripMargin,
    "q_quantile_exact_weighted" ->
      """WITH li AS (SELECT l_returnflag g, l_extendedprice x,
        |    cast(floor(l_quantity) AS BIGINT) w FROM lineitem),
        |bv AS (SELECT g, x, sum(w) w FROM li GROUP BY g, x),
        |c AS (SELECT g, x, sum(w) OVER (PARTITION BY g ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cw FROM bv),
        |t AS (SELECT g, sum(w) tw FROM bv GROUP BY g)
        |SELECT c.g AS g,
        |  min(CASE WHEN cw >= tw * 0.25 THEN x END) AS wq25,
        |  min(CASE WHEN cw >= tw * 0.5 THEN x END) AS wq50,
        |  min(CASE WHEN cw >= tw * 0.75 THEN x END) AS wq75
        |FROM c JOIN t ON c.g = t.g GROUP BY c.g
        |ORDER BY g NULLS FIRST, wq25 NULLS FIRST, wq50 NULLS FIRST, wq75 NULLS FIRST""".stripMargin,
    "q_max_intersections_pos" ->
      """WITH pts AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p, 1 AS d FROM events
        |  UNION ALL
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS p, -1 AS d FROM events),
        |sw AS (SELECT user_id, p,
        |    sum(d) OVER (PARTITION BY user_id ORDER BY p, d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM pts),
        |mx AS (SELECT user_id, max(open) AS mx FROM sw GROUP BY user_id)
        |SELECT sw.user_id AS user_id, min(p) AS peak_pos, cast(max(mx) AS int) AS max_open
        |FROM sw JOIN mx ON sw.user_id = mx.user_id AND sw.open = mx.mx
        |GROUP BY sw.user_id
        |ORDER BY user_id NULLS FIRST, peak_pos NULLS FIRST, max_open NULLS FIRST""".stripMargin,
    "q_exp_decay_avg" ->
      """WITH e AS (SELECT user_id, event_id,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000) / 3.6e9 AS t,
        |    value AS v
        |  FROM events)
        |SELECT user_id, event_id,
        |  round(sum(v * exp(t / 24.0)) OVER w / sum(exp(t / 24.0)) OVER w, 6)
        |    AS decayed_avg
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id NULLS FIRST, event_id NULLS FIRST, decayed_avg NULLS FIRST""".stripMargin
  )
}
