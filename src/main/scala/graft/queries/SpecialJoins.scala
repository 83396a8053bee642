package graft.queries

import graft.core.Tables
import graft.ops.Ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Non-ANSI join kinds (SURVEY.md §2.3; reference src/Core/Joins.h):
  * ASOF (nearest match by time inequality), ANY (first match, no row
  * multiplication), PASTE (positional). DuckDB's native ASOF JOIN serves
  * as the oracle for ours.
  */
object SpecialJoins {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // ASOF backward: for each 'error' event, the most recent preceding
    // 'click' by the same user. Right side is pre-aggregated per (user, ts)
    // so the nearest match is unique -> deterministic across engines.
    "q_asof_join" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("value")).as("click_value"))
      ordered(Ops.asofJoin(errors, clicks, Seq("user_id"),
          leftOn = col("ts"), rightOn = col("click_ts"), direction = "backward")
        .select(col("user_id"), col("event_id"), col("value"), col("click_value")))
    },

    // ASOF forward: for each 'signup', the next 'purchase' value by user.
    "q_asof_forward" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("p_ts"))
        .agg(max(col("value")).as("purchase_value"))
      ordered(Ops.asofJoin(signups, purchases, Seq("user_id"),
          leftOn = col("ts"), rightOn = col("p_ts"), direction = "forward")
        .select(col("user_id"), col("event_id"), col("purchase_value")))
    },

    // ANY INNER join: each order joined to exactly its first lineitem
    // (by l_linenumber) — no row multiplication (reference Joins.h:47).
    "q_any_join" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      val li = T(s, dir)("lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
      // l_linenumber is NOT unique per order in the fixtures — extend the
      // dedup order so the "first" row is deterministic. (Bare ascending
      // columns: anyJoin's dedup is a min_by over their struct.)
      ordered(Ops.anyJoin(o, li, Seq("o_orderkey"),
          Seq(col("l_linenumber"), col("l_extendedprice"), col("l_quantity")))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))
    },

    // PASTE join: rank-aligned top-50 customers and suppliers by account
    // balance (positional zip; reference PasteJoinTransform.cpp).
    "q_paste_join" -> { (s, dir) =>
      val c = T(s, dir)("customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey")).limit(50)
        .select(col("c_custkey"), col("c_acctbal"))
      val sup = T(s, dir)("supplier")
        .orderBy(col("s_acctbal").desc, col("s_suppkey")).limit(50)
        .select(col("s_suppkey"), col("s_acctbal"))
      ordered(Ops.pasteJoin(c, sup,
        Seq(col("c_acctbal").desc, col("c_custkey")),
        Seq(col("s_acctbal").desc, col("s_suppkey"))))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH errors AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'error'),
        |clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT e.user_id AS user_id, e.event_id AS event_id, e.value AS value, c.click_value
        |FROM errors e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts >= c.click_ts
        |ORDER BY e.user_id NULLS FIRST, e.event_id NULLS FIRST, e.value NULLS FIRST, click_value NULLS FIRST""".stripMargin,
    "q_asof_forward" ->
      """WITH signups AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'signup'),
        |purchases AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT s.user_id AS user_id, s.event_id AS event_id, p.purchase_value
        |FROM signups s ASOF LEFT JOIN purchases p
        |  ON s.user_id = p.user_id AND s.ts <= p.p_ts
        |ORDER BY s.user_id NULLS FIRST, s.event_id NULLS FIRST, purchase_value NULLS FIRST""".stripMargin,
    "q_any_join" ->
      """SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity, l_extendedprice
        |FROM orders JOIN (
        |  SELECT l_orderkey AS o_orderkey, l_linenumber, l_quantity, l_extendedprice
        |  FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |          ORDER BY l_linenumber ASC, l_extendedprice ASC, l_quantity ASC) AS rn
        |        FROM lineitem)
        |  WHERE rn = 1) li USING (o_orderkey)
        |ORDER BY o_orderkey NULLS FIRST, o_totalprice NULLS FIRST, l_linenumber NULLS FIRST, l_quantity NULLS FIRST, l_extendedprice NULLS FIRST""".stripMargin,
    "q_paste_join" ->
      """SELECT c_custkey, c_acctbal, s_suppkey, s_acctbal FROM (
        |  SELECT c_custkey, c_acctbal, row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS idx
        |  FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 50) c
        |JOIN (
        |  SELECT s_suppkey, s_acctbal, row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS idx
        |  FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 50) s
        |USING (idx)
        |ORDER BY c_custkey NULLS FIRST, c_acctbal NULLS FIRST, s_suppkey NULLS FIRST, s_acctbal NULLS FIRST""".stripMargin
  )
}
