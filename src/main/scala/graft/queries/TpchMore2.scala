package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H tail (Q7, Q8, Q9, Q13, Q15, Q17, Q21, Q22), fixture-adapted:
  * no partsupp table (Q2/Q11/Q16/Q20 are out of fixture scope), no
  * receipt/commit dates (Q21's lateness = shipped > 60 days after order
  * date), no phone column (Q22 buckets by the trailing digit of c_name).
  * The SHAPES — multi-nation self-joins, market-share ratios, left-join
  * distributions, scalar-max views, correlated small-quantity filters,
  * EXISTS/NOT-EXISTS chains — are the point: they exercise join order,
  * broadcast choice and semi/anti planning end to end. Knife-edge
  * comparisons against averages are exactified to integer cross
  * multiplication so the oracle can never flip on FP fold order. */
object TpchMore2 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  private def ts(d: String) = lit(d).cast("timestamp")

  val queries: Map[String, Q] = Map(

    // Q7: shipping volume between two nations by year.
    "q7_volume_shipping" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
        .filter(col("l_shipdate") >= ts("1995-01-01") && col("l_shipdate") < ts("1997-01-01"))
      val o = T(s, dir)("orders")
      val c = T(s, dir)("customer")
      val su = T(s, dir)("supplier")
      val n1 = T(s, dir)("nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = T(s, dir)("nation").select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      ordered(li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")).as("revenue_cents")))
    },

    // Q8: market share of one supplier nation among a customer region.
    "q8_market_share" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val o = T(s, dir)("orders")
        .filter(col("o_orderdate") >= ts("1995-01-01") && col("o_orderdate") < ts("1997-01-01"))
      val c = T(s, dir)("customer")
      val p = T(s, dir)("part").filter(col("p_type") === "ECONOMY")
      val su = T(s, dir)("supplier")
      val n1 = T(s, dir)("nation").select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val r = T(s, dir)("region").filter(col("r_name") === "ASIA")
      val n2 = T(s, dir)("nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val vol = li
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n1, col("c_nationkey") === col("c_nk"))
        .join(r, col("c_rk") === col("r_regionkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(n2, col("s_nationkey") === col("s_nk"))
        .select(year(col("o_orderdate")).as("o_year"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long").as("vol_cents"),
          col("supp_nation"))
      ordered(vol.groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("vol_cents")).otherwise(0L)).as("nat"),
          sum(col("vol_cents")).as("tot"))
        .select(col("o_year"),
          floor(col("nat") * 1000000L / col("tot")).cast("long").as("mkt_share_ppm")))
    },

    // Q9: product profit by supplier nation and year. No ps_supplycost in
    // the fixture: cost is modeled as 10% of p_retailprice per unit.
    "q9_product_profit" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val o = T(s, dir)("orders")
      val p = T(s, dir)("part").filter(col("p_name").contains("red"))
      val su = T(s, dir)("supplier")
      val n = T(s, dir)("nation")
      ordered(li
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(floor((col("l_extendedprice") * (lit(1) - col("l_discount")) -
            col("p_retailprice") * col("l_quantity") * 0.1) * 100 + 0.5)
          .cast("long")).as("profit_cents")))
    },

    // Q13: distribution of customers by order count (left join so
    // zero-order customers land in the c_count = 0 bucket; the comment
    // filter is adapted to order priority).
    "q13_customer_distribution" -> { (s, dir) =>
      val c = T(s, dir)("customer")
      val o = T(s, dir)("orders").filter(col("o_orderpriority") =!= "1-URGENT")
      val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      ordered(perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist")))
    },

    // Q15: the supplier(s) achieving the maximum quarterly revenue —
    // the revenue "view" is a tiny aggregate, its max a 1-row broadcast.
    "q15_top_supplier" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
      val rev = li.groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")).as("total_revenue_cents"))
      val mx = rev.agg(max(col("total_revenue_cents")).as("mx"))
      val su = T(s, dir)("supplier")
      ordered(rev.join(broadcast(mx), col("total_revenue_cents") === col("mx"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_cents")))
    },

    // Q17: revenue impact of eliminating small-quantity orders. The
    // correlated "below 20% of this part's average quantity" predicate is
    // cross-multiplied into integers: 5 * qty * cnt(part) < sum_qty(part).
    "q17_small_qty" -> { (s, dir) =>
      val p = T(s, dir)("part").filter(col("p_brand") === "Brand#3" && col("p_size") === 5)
      val li = T(s, dir)("lineitem")
      val perPart = li.join(p, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("cnt"))
      ordered(li.join(p, col("l_partkey") === col("p_partkey"), "left_semi")
        .join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast("long") * 5 * col("cnt") < col("sum_qty"))
        .agg(floor(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")) / 7.0)
          .cast("long").as("avg_yearly_cents")))
    },

    // Q21: suppliers who alone were late on a multi-supplier order
    // (lateness adapted: shipped more than 60 days after the order date).
    // EXISTS → left-semi on another supplier's line; NOT EXISTS →
    // left-anti on another supplier's LATE line.
    "q21_waiting_supplier" -> { (s, dir) =>
      val o = T(s, dir)("orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = T(s, dir)("lineitem").select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val l1 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate").cast("timestamp") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          col("o_orderdate").as("od"))
      val l2 = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"),
        col("l_shipdate").as("sd2"))
      val withOther = l1.join(l2,
        col("ok") === col("ok2") && col("sk2") =!= col("sk"), "left_semi")
      val soleLate = withOther.join(l2,
        col("ok") === col("ok2") && col("sk2") =!= col("sk") &&
          col("sd2") > col("od").cast("timestamp") + expr("INTERVAL 60 DAYS"),
        "left_anti")
      val su = T(s, dir)("supplier")
      ordered(soleLate.join(su, col("sk") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("numwait")))
    },

    // Q22: customers with above-average balance and no orders, bucketed
    // (by the trailing digit of c_name — the fixture has no phone). The
    // above-average predicate is cross-multiplied into cents integers.
    "q22_global_sales" -> { (s, dir) =>
      val c = T(s, dir)("customer")
        .withColumn("bucket", substring(col("c_name"), -1, 1))
        .withColumn("bal_cents", floor(col("c_acctbal") * 100 + 0.5).cast("long"))
        .filter(col("bucket").isin("1", "2", "3", "4", "5"))
      val avgStats = c.filter(col("bal_cents") > 0)
        .agg(sum(col("bal_cents")).as("sum_bal"), count(lit(1)).as("n_bal"))
      // "no orders in the recent window" (every fixture customer has SOME
      // order, per FIXTURES.md — the TPC-H predicate is time-scoped anyway)
      val o = T(s, dir)("orders")
        .filter(col("o_orderdate") >= ts("1999-01-01"))
        .select(col("o_custkey"))
      ordered(c.crossJoin(broadcast(avgStats))
        .filter(col("bal_cents") * col("n_bal") > col("sum_bal"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("totacctbal_cents")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation NULLS FIRST, cust_nation NULLS FIRST, l_year NULLS FIRST,
        |  revenue_cents NULLS FIRST""".stripMargin,
    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS vol_cents,
        |    n2.n_name AS supp_nation
        |  FROM lineitem, part, orders, customer, supplier, nation n1, region, nation n2
        |  WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
        |    AND o_custkey = c_custkey AND l_suppkey = s_suppkey
        |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |    AND s_nationkey = n2.n_nationkey
        |    AND r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT o_year,
        |  cast(floor(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol_cents ELSE 0 END)
        |    * 1000000 / sum(vol_cents)) AS BIGINT) AS mkt_share_ppm
        |FROM vol GROUP BY o_year
        |ORDER BY o_year NULLS FIRST, mkt_share_ppm NULLS FIRST""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  cast(sum(cast(floor((l_extendedprice * (1 - l_discount)
        |      - p_retailprice * l_quantity * 0.1) * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS profit_cents
        |FROM lineitem, part, supplier, orders, nation
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation NULLS FIRST, o_year NULLS FIRST, profit_cents NULLS FIRST""".stripMargin,
    "q13_customer_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT cast(c_count AS BIGINT) AS c_count, count(*) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY c_count NULLS FIRST, custdist NULLS FIRST""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS total_revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
        |ORDER BY s_suppkey NULLS FIRST, s_name NULLS FIRST, total_revenue_cents NULLS FIRST""".stripMargin,
    "q17_small_qty" ->
      """WITH pp AS (
        |  SELECT l_partkey AS pk, cast(sum(cast(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |    count(*) AS cnt
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3' AND p_size = 5
        |  GROUP BY l_partkey)
        |SELECT cast(floor(sum(cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 7.0) AS BIGINT)
        |  AS avg_yearly_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN pp ON l_partkey = pk
        |WHERE p_brand = 'Brand#3' AND p_size = 5
        |  AND cast(l_quantity AS BIGINT) * 5 * cnt < sum_qty""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY s_name NULLS FIRST, numwait NULLS FIRST""".stripMargin,
    "q22_global_sales" ->
      """WITH c AS (
        |  SELECT c_custkey, substr(c_name, -1, 1) AS bucket,
        |    cast(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer
        |  WHERE substr(c_name, -1, 1) IN ('1', '2', '3', '4', '5')),
        |st AS (SELECT cast(sum(bal_cents) AS BIGINT) AS sum_bal, count(*) AS n_bal
        |  FROM c WHERE bal_cents > 0)
        |SELECT bucket, count(*) AS numcust,
        |  cast(sum(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM c, st
        |WHERE bal_cents * n_bal > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY bucket
        |ORDER BY bucket NULLS FIRST, numcust NULLS FIRST, totacctbal_cents NULLS FIRST""".stripMargin
  )
}
