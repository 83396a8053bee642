package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line aggregates + geo (SURVEY.md §2.4 misc / §2.8 geo):
  * intervalLengthSum, maxIntersections, greatCircleDistance.
  */
object Misc2 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // intervalLengthSum (reference AggregateFunctionIntervalLengthSum):
    // length of the union of [ts, ts+1h) intervals per user — classic
    // sweep: clip each interval at the running max end of its
    // predecessors; one window over the per-user ordering.
    "q_interval_length_sum" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val hourUs = 3600L * 1000000
      val iv = e.select(col("user_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + hourUs).as("en"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("en"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ordered(iv
        .withColumn("prev_max_end", max(col("en")).over(w))
        .withColumn("covered",
          greatest(col("en") - greatest(col("s"), coalesce(col("prev_max_end"), col("s"))), lit(0L)))
        .groupBy(col("user_id"))
        .agg((sum(col("covered")) / 1e6).as("union_sec")))
    },

    // maxIntersections (reference AggregateFunctionMaxIntersections): max
    // number of simultaneously-open [ts, ts+1h) intervals per user —
    // sweep with +1 at start, -1 at end, running sum, max.
    "q_max_intersections" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val hourUs = 3600L * 1000000
      val pts = e.select(col("user_id"), unix_micros(col("ts")).as("p"), lit(1).as("d"))
        .unionByName(e.select(col("user_id"),
          (unix_micros(col("ts")) + hourUs).as("p"), lit(-1).as("d")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("p"), col("d"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ordered(pts
        .withColumn("open", sum(col("d")).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("open")).cast("int").as("max_open")))
    },

    // greatCircleDistance (reference greatCircleDistance.cpp) — haversine
    // on derived coordinates; identical formula on both engines.
    "q_geo_distance" -> { (s, dir) =>
      val n = T(s, dir)("nation")
      val lat1 = (col("n_nationkey") * 7 % 180 - 90).cast("double")
      val lon1 = (col("n_nationkey") * 31 % 360 - 180).cast("double")
      val lat2 = (col("n_regionkey") * 13 % 180 - 90).cast("double")
      val lon2 = (col("n_regionkey") * 47 % 360 - 180).cast("double")
      def rad(c: org.apache.spark.sql.Column) = c * math.Pi / 180.0
      val a = pow(sin((rad(lat2) - rad(lat1)) / 2), 2) +
        cos(rad(lat1)) * cos(rad(lat2)) * pow(sin((rad(lon2) - rad(lon1)) / 2), 2)
      val d = lit(2.0 * 6371000.0) * asin(sqrt(a))
      ordered(n.select(col("n_nationkey"), round(d, 3).as("dist_m")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_interval_length_sum" ->
      """WITH iv AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |    epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS en
        |  FROM events),
        |c AS (SELECT user_id, s, en,
        |    max(en) OVER (PARTITION BY user_id ORDER BY s, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv)
        |SELECT user_id,
        |  sum(greatest(en - greatest(s, coalesce(pme, s)), 0)) / 1e6 AS union_sec
        |FROM c GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, union_sec NULLS FIRST""".stripMargin,
    "q_max_intersections" ->
      """WITH pts AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p, 1 AS d FROM events
        |  UNION ALL
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS p, -1 AS d FROM events),
        |sw AS (SELECT user_id,
        |    sum(d) OVER (PARTITION BY user_id ORDER BY p, d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM pts)
        |SELECT user_id, cast(max(open) AS int) AS max_open
        |FROM sw GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, max_open NULLS FIRST""".stripMargin,
    "q_geo_distance" ->
      """SELECT n_nationkey,
        |  round(2.0 * 6371000.0 * asin(sqrt(
        |    pow(sin((radians(CAST(n_regionkey * 13 % 180 - 90 AS DOUBLE))
        |           - radians(CAST(n_nationkey * 7 % 180 - 90 AS DOUBLE))) / 2), 2)
        |    + cos(radians(CAST(n_nationkey * 7 % 180 - 90 AS DOUBLE)))
        |      * cos(radians(CAST(n_regionkey * 13 % 180 - 90 AS DOUBLE)))
        |      * pow(sin((radians(CAST(n_regionkey * 47 % 360 - 180 AS DOUBLE))
        |               - radians(CAST(n_nationkey * 31 % 360 - 180 AS DOUBLE))) / 2), 2)
        |  )), 3) AS dist_m
        |FROM nation
        |ORDER BY n_nationkey NULLS FIRST""".stripMargin
  )
}
