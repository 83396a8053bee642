package graft.queries

import graft.core.Tables
import graft.ops.Combinators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregate tail, batch 4: groupArrayInsertAt and the LOESS-trend STL
  * variant of series decomposition (reference:
  * src/AggregateFunctions/AggregateFunctionGroupArrayInsertAt.h,
  * src/Functions/seriesDecomposeSTL.cpp — STL per Cleveland et al. 1990;
  * the trend pass here is a genuine local weighted linear regression
  * with tricube weights, not a moving average).
  */
object Aggregates4 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // groupArrayInsertAt(0)(qty, linenumber-1) per order: quantities
    // placed at their line positions, gaps filled with 0.
    "q_group_array_insert_at" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      // Exploded to (key, position, value) scalar rows — the driver's
      // comparator can't sort ARRAY columns; all values are integral.
      ordered(Combinators.groupArrayInsertAt(
          li, Seq(col("l_orderkey")),
          floor(col("l_quantity")).cast("long"), col("l_linenumber") - 1,
          lit(0L), None, "qty_at")
        .select(col("l_orderkey"), posexplode(col("qty_at")).as(Seq("i", "v"))))
    },

    // STL-style decomposition with a LOESS trend: for each point, a
    // tricube-weighted linear fit over the +/-3-day neighborhood
    // (closed-form weighted least squares, evaluated at the center);
    // seasonal = per-weekday mean of the detrended series re-centered
    // to sum 0; residual = remainder. The neighborhood join is keyed on
    // (event_type, t) — fully partitioned, no window over a whole series.
    "q_series_decompose_stl" -> { (s, dir) =>
      val d = T(s, dir)("events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("y"))
        .withColumn("t", datediff(col("day"), lit("2024-01-01").cast("date")))
      val b = d.select(col("event_type").as("et2"), col("t").as("t2"), col("y").as("yn"))
      val nb = d.join(b,
          col("event_type") === col("et2") && abs(col("t2") - col("t")) <= 3)
        .withColumn("x", (col("t2") - col("t")).cast("double"))
        .withColumn("w", pow(lit(1.0) - pow(abs(col("x")) / 4.0, 3), 3))
      val fit = nb.groupBy(col("event_type"), col("day"), col("y")).agg(
        sum(col("w")).as("sw"),
        sum(col("w") * col("x")).as("swx"),
        sum(col("w") * col("x") * col("x")).as("swx2"),
        sum(col("w") * col("yn")).as("swy"),
        sum(col("w") * col("x") * col("yn")).as("swxy"))
      val tr = fit.withColumn("trend",
          round((col("swy") * col("swx2") - col("swx") * col("swxy")) /
            (col("sw") * col("swx2") - col("swx") * col("swx")), 6))
        .withColumn("detr", col("y") - col("trend"))
        .withColumn("dow", dayofweek(col("day")))
      val seasonal = tr.groupBy(col("event_type").as("et"), col("dow").as("dw"))
        .agg(avg(col("detr")).as("sraw"))
      val sMean = seasonal.groupBy(col("et").as("et3"))
        .agg(avg(col("sraw")).as("smean"))
      val j = tr
        .join(seasonal, col("event_type") === col("et") && col("dow") === col("dw"))
        .join(sMean, col("event_type") === col("et3"))
      ordered(j.select(
        col("event_type"), col("day"), col("y"), col("trend"),
        round(col("sraw") - col("smean"), 6).as("seasonal"),
        round(col("y") - col("trend") - (col("sraw") - col("smean")), 6).as("residual")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_group_array_insert_at" ->
      """WITH perpos AS (SELECT l_orderkey, l_linenumber - 1 AS p,
        |    cast(floor(min(l_quantity)) AS BIGINT) AS m
        |  FROM lineitem GROUP BY 1, 2),
        |lens AS (SELECT l_orderkey, max(p) + 1 AS n FROM perpos GROUP BY 1),
        |grid AS (SELECT l_orderkey, unnest(range(n)) AS i FROM lens),
        |filled AS (SELECT g.l_orderkey AS okey, g.i AS i, coalesce(p.m, 0) AS v
        |  FROM grid g LEFT JOIN perpos p ON p.l_orderkey = g.l_orderkey AND p.p = g.i)
        |SELECT okey AS l_orderkey, CAST(i AS INT) AS i, v
        |FROM filled
        |ORDER BY l_orderkey NULLS FIRST, i NULLS FIRST, v NULLS FIRST""".stripMargin,
    "q_series_decompose_stl" ->
      """WITH d AS (SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |    CAST(count(*) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |dt AS (SELECT event_type, day, y,
        |    date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) AS t FROM d),
        |nb AS (SELECT a.event_type, a.day, a.y,
        |    CAST(b.t - a.t AS DOUBLE) AS x, b.y AS yn,
        |    power(1 - power(abs(b.t - a.t) / 4.0, 3), 3) AS w
        |  FROM dt a JOIN dt b ON a.event_type = b.event_type AND abs(b.t - a.t) <= 3),
        |fit AS (SELECT event_type, day, y,
        |    sum(w) AS sw, sum(w*x) AS swx, sum(w*x*x) AS swx2,
        |    sum(w*yn) AS swy, sum(w*x*yn) AS swxy
        |  FROM nb GROUP BY 1, 2, 3),
        |tr AS (SELECT event_type, day, y,
        |    round((swy*swx2 - swx*swxy) / (sw*swx2 - swx*swx), 6) AS trend,
        |    y - round((swy*swx2 - swx*swxy) / (sw*swx2 - swx*swx), 6) AS detr,
        |    cast(date_part('dow', day) AS int) + 1 AS dow
        |  FROM fit),
        |s AS (SELECT event_type, dow, avg(detr) AS sraw FROM tr GROUP BY 1, 2),
        |sm AS (SELECT event_type, avg(sraw) AS smean FROM s GROUP BY 1)
        |SELECT tr.event_type AS event_type, day, y, trend,
        |  round(sraw - smean, 6) AS seasonal,
        |  round(y - trend - (sraw - smean), 6) AS residual
        |FROM tr
        |JOIN s ON tr.event_type = s.event_type AND tr.dow = s.dow
        |JOIN sm ON tr.event_type = sm.event_type
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST, y NULLS FIRST,
        |  trend NULLS FIRST, seasonal NULLS FIRST, residual NULLS FIRST""".stripMargin
  )
}
