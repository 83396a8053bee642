package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time window semantics (SURVEY.md §2.9) verified in batch mode —
  * the same window()/session_window() expressions run unchanged under
  * readStream (StreamingSpec drives them as true streams with watermarks;
  * these oracle-checked queries pin the window-assignment semantics).
  */
object Streaming {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // Tumbling 1-day windows (reference tumble(): FunctionsTimeWindow.cpp:167).
    "q_window_tumble" -> { (s, dir) =>
      val e = T(s, dir)("events")
      ordered(e.groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("total")))
    },

    // Hopping 2-day/1-day windows (reference hop(): FunctionsTimeWindow.cpp:345)
    // — every event lands in exactly two windows.
    "q_window_hop" -> { (s, dir) =>
      val e = T(s, dir)("events")
      ordered(e.groupBy(window(col("ts"), "2 days", "1 day"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .select(col("window.start").as("w_start"), col("n"), col("total")))
    },

    // Session windows, 12-hour gap, per user (Spark superset — the
    // reference WindowView has no session windows).
    "q_window_session" -> { (s, dir) =>
      val e = T(s, dir)("events")
      ordered(e.groupBy(session_window(col("ts"), "12 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("user_id"), col("n_events"), col("total")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_window_tumble" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start,
        |  event_type, count(*) AS n, sum(value) AS total
        |FROM events GROUP BY 1, 2
        |ORDER BY w_start NULLS FIRST, event_type NULLS FIRST, n NULLS FIRST, total NULLS FIRST""".stripMargin,
    "q_window_hop" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |x AS (SELECT ts, value,
        |    unnest([date_trunc('day', ts), date_trunc('day', ts) - INTERVAL 1 DAY]) AS w_start
        |  FROM e)
        |SELECT CAST(w_start AS TIMESTAMP) AS w_start, count(*) AS n, sum(value) AS total
        |FROM x GROUP BY 1
        |ORDER BY w_start NULLS FIRST, n NULLS FIRST, total NULLS FIRST""".stripMargin,
    "q_window_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |flagged AS (SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           > INTERVAL 12 HOUR OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |sess AS (SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT min(ts) AS s_start, max(ts) + INTERVAL 12 HOUR AS s_end,
        |  user_id, count(*) AS n_events, sum(value) AS total
        |FROM sess GROUP BY user_id, sid
        |ORDER BY s_start NULLS FIRST, s_end NULLS FIRST, user_id NULLS FIRST, n_events NULLS FIRST, total NULLS FIRST""".stripMargin
  )
}
