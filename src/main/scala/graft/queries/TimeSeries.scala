package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analysis (reference: src/Functions/seriesDecomposeSTL.cpp,
  * seriesPeriodDetectFFT.cpp). Spark-native reformulations:
  * moving-average classical decomposition (trend/seasonal/residual —
  * documented simplification of LOESS-based STL) and autocorrelation
  * period detection (argmax over candidate lags — the time-domain dual
  * of the reference's FFT peak). Everything is windows + joins, so the
  * plans stay partitioned by series key.
  */
object TimeSeries {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  /** Daily event counts per type — the base series. */
  private def daily(s: SparkSession, dir: String): DataFrame =
    T(s, dir)("events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("y"))

  val queries: Map[String, Q] = Map(
    // Classical decomposition, period 7: trend = centered 7-day moving
    // average, seasonal = per-weekday mean of the detrended series
    // (re-centered to sum 0 over the 7 phases), residual = remainder.
    "q_series_decompose" -> { (s, dir) =>
      val d = daily(s, dir)
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-3, 3)
      val withTrend = d.withColumn("trend", avg(col("y")).over(w))
        .withColumn("detr", col("y") - col("trend"))
        .withColumn("dow", dayofweek(col("day")))
      val seasonal = withTrend.groupBy(col("event_type").as("et"), col("dow").as("dw"))
        .agg(avg(col("detr")).as("sraw"))
      val sMean = seasonal.groupBy(col("et").as("et2"))
        .agg(avg(col("sraw")).as("smean"))
      val withSeason = withTrend
        .join(seasonal, col("event_type") === col("et") && col("dow") === col("dw"))
        .join(sMean, col("event_type") === col("et2"))
        .withColumn("seasonal", col("sraw") - col("smean"))
      ordered(withSeason.select(
        col("event_type"), col("day"), col("y"),
        round(col("trend"), 6).as("trend"),
        round(col("seasonal"), 6).as("seasonal"),
        round(col("y") - col("trend") - col("seasonal"), 6).as("residual")))
    },

    // Dominant period via autocorrelation over candidate lags 2..10:
    // per event type, the lag maximizing corr(y_t, y_{t-lag}) (rounded to
    // 6 first so the argmax is engine-stable; ties -> smallest lag).
    "q_series_period" -> { (s, dir) =>
      val d = daily(s, dir)
        .withColumn("t", datediff(col("day"), lit("2024-01-01").cast("date")))
      val lags = candidateLags(s)
      val cand = d.crossJoin(lags)
      val lagged = cand.as("a").join(
        d.select(col("event_type").as("et2"), col("t").as("t2"), col("y").as("ylag")),
        col("a.event_type") === col("et2") && col("a.t") === col("t2") + col("a.lag"))
      val corrs = lagged.groupBy(col("a.event_type").as("event_type"), col("a.lag").as("lag"))
        .agg(round(corr(col("a.y"), col("ylag")), 6).as("ac"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ac").desc, col("lag").asc)
      ordered(corrs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("lag").as("best_lag"), col("ac").as("best_ac")))
    },

    // PromQL-style regridding (reference: the timeSeriesRateToGrid /
    // timeSeriesLastToGrid aggregate group,
    // src/AggregateFunctions/AggregateFunctionTimeseries*.h): align
    // irregular samples onto a fixed-step grid. Per (event_type, grid
    // point): value = most recent sample within a 2 h staleness window
    // (ASOF-backward carry — the scale-safe union-sort formulation),
    // rate = clamped forward difference / step. Oracle: DuckDB's native
    // ASOF JOIN on a generate_series grid.
    "q_ts_regrid" -> { (s, dir) =>
      val step = 3600L // 1 h grid
      val stale = 7200L // 2 h staleness horizon
      val e = T(s, dir)("events")
      // dedup equal-ts samples deterministically (max value wins)
      val samples = e.groupBy(col("event_type"), col("ts").as("s_ts"))
        .agg(max(col("value")).as("s_val"))
      val types = e.select(col("event_type")).distinct()
      val grid = types.select(col("event_type"),
        explode(sequence(
          lit("2024-01-01 00:00:00").cast("timestamp"),
          lit("2024-01-07 23:00:00").cast("timestamp"),
          expr(s"INTERVAL $step SECONDS"))).as("g_ts"))
      val joined = graft.ops.Ops.asofJoin(grid, samples, Seq("event_type"),
        leftOn = col("g_ts"), rightOn = col("s_ts"), direction = "backward")
      val fresh = joined.withColumn("v",
        when(col("s_ts").isNotNull &&
          unix_micros(col("g_ts")) - unix_micros(col("s_ts")) <= stale * 1000000L,
          col("s_val")))
      val w = Window.partitionBy(col("event_type")).orderBy(col("g_ts"))
      ordered(fresh
        .withColumn("d", col("v") - lag(col("v"), 1).over(w))
        .select(col("event_type"), col("g_ts"),
          floor(col("v") * 1000000).cast("long").as("v_ppm"),
          floor(when(col("d") > 0, col("d")).otherwise(0.0) / step * 1000000000)
            .cast("long").as("rate_ppb")))
    }
  )

  /** Candidate lag list 2..10 as a tiny broadcastable frame. */
  private def candidateLags(s: SparkSession): DataFrame = {
    import s.implicits._
    (2 to 10).toDF("lag")
  }

  val oracleSql: Map[String, String] = Map(
    "q_series_decompose" ->
      """WITH d AS (SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |    CAST(count(*) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, day, y,
        |    avg(y) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
        |    cast(date_part('dow', day) AS int) + 1 AS dow
        |  FROM d),
        |t2 AS (SELECT *, y - trend AS detr FROM t),
        |s AS (SELECT event_type, dow, avg(detr) AS sraw FROM t2 GROUP BY 1, 2),
        |sm AS (SELECT event_type, avg(sraw) AS smean FROM s GROUP BY 1)
        |SELECT t2.event_type AS event_type, day, y,
        |  round(trend, 6) AS trend,
        |  round(sraw - smean, 6) AS seasonal,
        |  round(y - trend - (sraw - smean), 6) AS residual
        |FROM t2
        |JOIN s ON t2.event_type = s.event_type AND t2.dow = s.dow
        |JOIN sm ON t2.event_type = sm.event_type
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST, y NULLS FIRST,
        |  trend NULLS FIRST, seasonal NULLS FIRST, residual NULLS FIRST""".stripMargin,
    "q_ts_regrid" ->
      """WITH samples AS (SELECT event_type, ts AS s_ts, max(value) AS s_val
        |    FROM events GROUP BY event_type, ts),
        |types AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT event_type, g_ts FROM types,
        |    generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |      TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR) AS t(g_ts)),
        |j AS (SELECT g.event_type, g.g_ts, s.s_ts, s.s_val
        |    FROM grid g ASOF LEFT JOIN samples s
        |      ON g.event_type = s.event_type AND g.g_ts >= s.s_ts),
        |f AS (SELECT event_type, g_ts,
        |    CASE WHEN s_ts IS NOT NULL
        |      AND epoch_us(g_ts) - epoch_us(s_ts) <= 7200000000 THEN s_val END AS v
        |  FROM j),
        |d AS (SELECT event_type, g_ts, v,
        |    v - lag(v) OVER (PARTITION BY event_type ORDER BY g_ts) AS d FROM f)
        |SELECT event_type, g_ts,
        |  CAST(floor(v * 1000000) AS BIGINT) AS v_ppm,
        |  CAST(floor((CASE WHEN d > 0 THEN d ELSE 0.0 END) / 3600 * 1000000000) AS BIGINT)
        |    AS rate_ppb
        |FROM d
        |ORDER BY event_type NULLS FIRST, g_ts NULLS FIRST, v_ppm NULLS FIRST,
        |  rate_ppb NULLS FIRST""".stripMargin,
    "q_series_period" ->
      """WITH d AS (SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |    CAST(count(*) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |dt AS (SELECT event_type, date_diff('day', DATE '2024-01-01', day) AS t, y FROM d),
        |pairs AS (SELECT a.event_type, l.lag, a.y, b.y AS ylag
        |  FROM dt a
        |  CROSS JOIN (SELECT unnest(range(2, 11)) AS lag) l
        |  JOIN dt b ON a.event_type = b.event_type AND a.t = b.t + l.lag),
        |c AS (SELECT event_type, cast(lag AS int) AS lag, round(corr(y, ylag), 6) AS ac
        |  FROM pairs GROUP BY 1, 2),
        |r AS (SELECT event_type, lag, ac,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ac DESC, lag ASC) AS rn
        |  FROM c)
        |SELECT event_type, lag AS best_lag, ac AS best_ac FROM r WHERE rn = 1
        |ORDER BY event_type NULLS FIRST, best_lag NULLS FIRST, best_ac NULLS FIRST""".stripMargin
  )
}
