package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** More TPC-H-shaped compound queries (fixture-adapted dates/columns):
  * existence joins, conditional aggregation, OR-of-ANDs pushdown, and
  * HAVING-style subquery joins. These exercise the optimizer end to end
  * — join order, broadcast choice, semi-join planning — rather than any
  * single operator. Money sums are emitted as whole-unit floor() longs
  * (see q_fn_math: cross-engine round() is not bit-stable).
  */
object TpchMore {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(

    // Q4 shape: EXISTS(late lineitem) per order priority — planner should
    // pick a LeftSemi with the date predicate on both sides.
    "q4_order_priority" -> { (s, dir) =>
      val o = T(s, dir)("orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val li = T(s, dir)("lineitem").select(col("l_orderkey"), col("l_shipdate"))
      val late = o.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate").cast("timestamp") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      ordered(late.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count")))
    },

    // Q10 shape: revenue lost to returns per customer in a quarter.
    "q10_returned_items" -> { (s, dir) =>
      val c = T(s, dir)("customer")
      val o = T(s, dir)("orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val li = T(s, dir)("lineitem").filter(col("l_returnflag") === "R")
      ordered(c.join(o, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(floor(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) + 0.5)
          .as("revenue")))
    },

    // Q12 shape: conditional priority counts per line status for a year.
    "q12_priority_counts" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val o = T(s, dir)("orders")
      ordered(li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_count")))
    },

    // Q14 shape: promo revenue share over a month (broadcast part dim).
    "q14_promo_effect" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      val p = T(s, dir)("part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(floor(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
          / sum(rev) * 1e8 + 0.5).as("promo_share_1e8"))
    },

    // Q18 shape: large orders (per-order quantity sum above threshold)
    // joined back to customers — aggregate-subquery-in-FROM planning.
    "q18_large_orders" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q")).filter(col("q") > 300)
      val o = T(s, dir)("orders")
      val c = T(s, dir)("customer")
      ordered(big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("q").cast("long").as("total_qty")))
    },

    // Q19 shape: OR-of-ANDs across the part join — the whole disjunction
    // must stay in the join/filter, not force a cartesian.
    "q19_discounted_revenue" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val p = T(s, dir)("part")
      val cond =
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 30))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey") && cond)
        .agg(floor(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) + 0.5)
          .as("revenue"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q4_order_priority" ->
      """SELECT o_orderpriority, cast(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST, order_count NULLS FIRST""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(floor(sum(l_extendedprice * (1 - l_discount)) + 0.5) AS BIGINT) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey NULLS FIRST, c_name NULLS FIRST, revenue NULLS FIRST""".stripMargin,
    "q12_priority_counts" ->
      """SELECT l_linestatus,
        |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus NULLS FIRST, high_count NULLS FIRST, low_count NULLS FIRST""".stripMargin,
    "q14_promo_effect" ->
      """SELECT CAST(floor(
        |    sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
        |    / sum(l_extendedprice * (1 - l_discount)) * 1e8 + 0.5) AS BIGINT)
        |  AS promo_share_1e8
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS q
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
        |  CAST(floor(q) AS BIGINT) AS total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey NULLS FIRST, c_name NULLS FIRST, o_orderkey NULLS FIRST,
        |  o_totalprice NULLS FIRST, total_qty NULLS FIRST""".stripMargin,
    "q19_discounted_revenue" ->
      """SELECT CAST(floor(sum(l_extendedprice * (1 - l_discount)) + 0.5) AS BIGINT)
        |  AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 20
        |    AND l_quantity BETWEEN 10 AND 30)""".stripMargin
  )
}
