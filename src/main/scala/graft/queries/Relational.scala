package graft.queries

import graft.core.Tables
import graft.ops.Ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scan/filter/project, equi/semi/anti/cross joins,
  * aggregation (incl. rollup/cube/grouping sets/totals), set ops, sort/
  * limit/distinct/limit-by (SURVEY.md §2.1-2.4, 2.6, 2.7).
  *
  * Every query is expressed with the DataFrame API so Catalyst handles
  * pushdown/pruning/join strategy; small dims (region/nation) broadcast
  * automatically under AQE. Every query ends in a full-column ORDER BY for
  * the oracle protocol.
  */
object Relational {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: scan + filter + hash agg + sort (reference pricing
    // summary; exercises partial/final agg split == Aggregator two-stage,
    // reference src/Interpreters/Aggregator.h).
    "q1_pricing_summary" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          avg(col("l_quantity")).as("avg_qty"),
          avg(col("l_extendedprice")).as("avg_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")))
    },

    // Projection + predicate; both must reach the parquet scan.
    "q2_filter_project" -> { (s, dir) =>
      val p = T(s, dir)("part")
      ordered(p
        .filter(col("p_size") < 15 && col("p_type").like("%ECO%"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_retailprice")))
    },

    // TPC-H Q6 shape: conditional range filter + global agg.
    "q6_forecast_revenue" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      li.filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },

    // TPC-H Q3 shape: 3-way join + agg; ordered by keys (not the float
    // measure) for cross-engine determinism.
    "q3_shipping_priority" -> { (s, dir) =>
      val c = T(s, dir)("customer").filter(col("c_mktsegment") === "BUILDING")
      val o = T(s, dir)("orders").filter(col("o_orderdate") < lit("1996-03-15").cast("timestamp"))
      val li = T(s, dir)("lineitem").filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      ordered(c.join(o, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue")))
    },

    // TPC-H Q5 shape: 6-way join through the dimension chain; region and
    // nation are broadcast-size.
    "q5_local_supplier" -> { (s, dir) =>
      val r = broadcast(T(s, dir)("region").filter(col("r_name") === "ASIA"))
      val n = broadcast(T(s, dir)("nation"))
      val c = T(s, dir)("customer")
      val o = T(s, dir)("orders")
      val li = T(s, dir)("lineitem")
      val sup = T(s, dir)("supplier")
      ordered(li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue")))
    },

    // Left outer join + agg over the nullable side.
    "q_join_left" -> { (s, dir) =>
      val c = T(s, dir)("customer")
      val o = T(s, dir)("orders")
      ordered(c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(sum(col("o_totalprice")), lit(0.0)).as("total_spent")))
    },

    // Right outer join: all orders kept, optional high-value lineitem agg.
    "q_join_right" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_quantity") > 48)
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("big_qty"))
      val o = T(s, dir)("orders")
      ordered(li.join(o, col("l_orderkey") === col("o_orderkey"), "right")
        .select(col("o_orderkey"), col("o_orderstatus"), col("big_qty")))
    },

    // Full outer join of two aggregated sides (nation-level customer vs
    // supplier balance).
    "q_join_full" -> { (s, dir) =>
      val cn = T(s, dir)("customer").groupBy(col("c_nationkey").as("nk"))
        .agg(sum(col("c_acctbal")).as("cust_bal"))
      val sn = T(s, dir)("supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(sum(col("s_acctbal")).as("supp_bal"))
      ordered(cn.join(sn, Seq("nk"), "full")
        .select(col("nk"), col("cust_bal"), col("supp_bal")))
    },

    // LEFT SEMI (EXISTS) — orders that have at least one high-quantity line.
    "q_join_semi" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      val li = T(s, dir)("lineitem").filter(col("l_quantity") > 45)
      ordered(o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice")))
    },

    // LEFT ANTI (NOT EXISTS) — customers with no large order.
    "q_join_anti" -> { (s, dir) =>
      val c = T(s, dir)("customer")
      val o = T(s, dir)("orders").filter(col("o_totalprice") > 400000)
      ordered(c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")))
    },

    // Cross join (small × small) — reference Joins.h:18-19.
    "q_join_cross" -> { (s, dir) =>
      val r = T(s, dir)("region").select(col("r_name"))
      val n = T(s, dir)("nation").select(col("n_name"))
      ordered(r.crossJoin(n))
    },

    // Non-equi (theta) join: count order pairs per customer where a later
    // order is at least double the price of an earlier one.
    "q_join_theta" -> { (s, dir) =>
      val o1 = T(s, dir)("orders").select(col("o_custkey").as("ck"),
        col("o_orderkey").as("k1"), col("o_totalprice").as("p1"), col("o_orderdate").as("d1"))
      val o2 = T(s, dir)("orders").select(col("o_custkey").as("ck"),
        col("o_orderkey").as("k2"), col("o_totalprice").as("p2"), col("o_orderdate").as("d2"))
      ordered(o1.join(o2, Seq("ck"))
        .filter(col("d1") < col("d2") && col("p2") >= col("p1") * 2)
        .groupBy(col("ck")).agg(count(lit(1)).as("n_pairs")))
    },

    // Set ops (SURVEY §2.7).
    "q_set_union_all" -> { (s, dir) =>
      val c = T(s, dir)("customer").select(col("c_nationkey").as("nk"))
      val sup = T(s, dir)("supplier").select(col("s_nationkey").as("nk"))
      ordered(c.unionByName(sup).groupBy(col("nk")).agg(count(lit(1)).as("n")))
    },
    "q_set_intersect" -> { (s, dir) =>
      val c = T(s, dir)("customer").select(col("c_nationkey").as("nk"))
      val sup = T(s, dir)("supplier").select(col("s_nationkey").as("nk"))
      ordered(c.intersect(sup))
    },
    "q_set_except" -> { (s, dir) =>
      val p = T(s, dir)("part").select(col("p_partkey").as("pk"))
      val li = T(s, dir)("lineitem").filter(col("l_quantity") > 40)
        .select(col("l_partkey").as("pk"))
      ordered(p.except(li))
    },

    // DISTINCT (reference DistinctTransform).
    "q_distinct" -> { (s, dir) =>
      ordered(T(s, dir)("customer").select(col("c_mktsegment")).distinct())
    },

    // ORDER BY + LIMIT/OFFSET on a unique key (reference LimitTransform/
    // OffsetTransform; Catalyst plans TakeOrderedAndProject).
    "q_limit_offset" -> { (s, dir) =>
      T(s, dir)("orders").select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")).offset(50).limit(100)
    },

    // LIMIT 2 BY l_orderkey (reference LimitByTransform) via Ops.limitBy.
    "q_limit_by" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(Ops.limitBy(li,
        Seq(col("l_orderkey")),
        Seq(col("l_extendedprice").desc, col("l_linenumber").asc), 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("rn")))
    },

    // DISTINCT ON (c_nationkey) — first customer per nation by key order.
    "q_distinct_on" -> { (s, dir) =>
      val c = T(s, dir)("customer")
      ordered(Ops.distinctOn(c, Seq(col("c_nationkey")), Seq(col("c_custkey").asc))
        .select(col("c_nationkey"), col("c_custkey"), col("c_name")))
    },

    // Statistical aggregates (SURVEY §2.4 statistics family).
    "q_agg_stats" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_returnflag"))
        .agg(
          var_pop(col("l_quantity")).as("var_pop_qty"),
          var_samp(col("l_quantity")).as("var_samp_qty"),
          stddev_pop(col("l_extendedprice")).as("std_pop_price"),
          stddev_samp(col("l_extendedprice")).as("std_samp_price"),
          covar_pop(col("l_quantity"), col("l_extendedprice")).as("covar_pop_qp"),
          covar_samp(col("l_quantity"), col("l_extendedprice")).as("covar_samp_qp"),
          corr(col("l_quantity"), col("l_extendedprice")).as("corr_qp")))
    },

    // count(DISTINCT) exact (reference uniqExact) + grouped avg.
    "q_count_distinct" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_parts"),
             countDistinct(col("l_suppkey")).as("nd_supps"),
             count(lit(1)).as("n")))
    },

    // argMin/argMax (reference AggregateFunctionsArgMinMax) → min_by/max_by.
    "q_argminmax" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      ordered(o.groupBy(col("o_orderstatus"))
        .agg(max_by(col("o_custkey"), col("o_orderkey")).as("latest_cust"),
             min_by(col("o_custkey"), col("o_orderkey")).as("first_cust"),
             max(col("o_orderkey")).as("max_key")))
    },

    // GROUP BY ROLLUP (reference RollupStep).
    "q_rollup" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("n")))
    },

    // GROUP BY CUBE (reference CubeStep).
    "q_cube" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      ordered(o.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
        .select(col("o_orderstatus"), col("o_orderpriority"), col("sum_price"), col("n")))
    },

    // WITH TOTALS (reference TotalsHavingTransform) via Ops.withTotals.
    "q_totals" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      ordered(Ops.withTotals(o, Seq("o_orderstatus"),
        Seq(sum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))))
    },

    // HAVING (post-aggregation filter).
    "q_having" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300))
    },

    // IN (subquery) → semi join (reference CreatingSetsStep).
    "q_in_subquery" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val p = T(s, dir)("part").filter(col("p_size") < 10)
      ordered(li.join(p, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("sum_qty")))
    },

    // Scalar subquery: customers above global average balance.
    "q_scalar_subquery" -> { (s, dir) =>
      val c = T(s, dir)("customer")
      val avgBal = c.agg(avg(col("c_acctbal")).as("avg_bal"))
      ordered(c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal") * 1.5)
        .select(col("c_custkey"), col("c_acctbal")))
    },

    // CASE WHEN / multiIf (reference src/Functions/if.cpp, multiIf.cpp).
    "q_case_expr" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      ordered(o.select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q2_filter_project" ->
      """SELECT p_partkey, p_brand, p_size, p_retailprice FROM part
        |WHERE p_size < 15 AND p_type LIKE '%ECO%'
        |ORDER BY p_partkey NULLS FIRST, p_brand NULLS FIRST, p_size NULLS FIRST, p_retailprice NULLS FIRST""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT sum(l_extendedprice * l_discount) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-03-15'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY l_orderkey NULLS FIRST, o_orderdate NULLS FIRST, o_orderpriority NULLS FIRST, revenue NULLS FIRST""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name NULLS FIRST, revenue NULLS FIRST""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  coalesce(sum(o_totalprice), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey NULLS FIRST, c_name NULLS FIRST, n_orders NULLS FIRST, total_spent NULLS FIRST""".stripMargin,
    "q_join_right" ->
      """SELECT o_orderkey, o_orderstatus, big_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS big_qty
        |      FROM lineitem WHERE l_quantity > 48 GROUP BY l_orderkey) li
        |RIGHT JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY o_orderkey NULLS FIRST, o_orderstatus NULLS FIRST, big_qty NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT nk, cust_bal, supp_bal FROM
        |  (SELECT c_nationkey AS nk, sum(c_acctbal) AS cust_bal FROM customer GROUP BY 1) c
        |  FULL OUTER JOIN
        |  (SELECT s_nationkey AS nk, sum(s_acctbal) AS supp_bal FROM supplier GROUP BY 1) s
        |  USING (nk)
        |ORDER BY nk NULLS FIRST, cust_bal NULLS FIRST, supp_bal NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey NULLS FIRST, o_totalprice NULLS FIRST""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey NULLS FIRST, c_name NULLS FIRST, c_acctbal NULLS FIRST""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q_join_theta" ->
      """SELECT o1.o_custkey AS ck, count(*) AS n_pairs
        |FROM orders o1 JOIN orders o2 ON o1.o_custkey = o2.o_custkey
        |WHERE o1.o_orderdate < o2.o_orderdate AND o2.o_totalprice >= o1.o_totalprice * 2
        |GROUP BY 1
        |ORDER BY ck NULLS FIRST, n_pairs NULLS FIRST""".stripMargin,
    "q_set_union_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk NULLS FIRST""".stripMargin,
    "q_set_except" ->
      """SELECT p_partkey AS pk FROM part
        |EXCEPT SELECT l_partkey AS pk FROM lineitem WHERE l_quantity > 40
        |ORDER BY pk NULLS FIRST""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment NULLS FIRST",
    "q_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 50""".stripMargin,
    "q_limit_by" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        |  FROM lineitem) WHERE rn <= 2
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, l_extendedprice NULLS FIRST, rn NULLS FIRST""".stripMargin,
    "q_distinct_on" ->
      """SELECT c_nationkey, c_custkey, c_name FROM (
        |  SELECT c_nationkey, c_custkey, c_name,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey ASC) AS rn
        |  FROM customer) WHERE rn = 1
        |ORDER BY c_nationkey NULLS FIRST, c_custkey NULLS FIRST, c_name NULLS FIRST""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  var_pop(l_quantity) AS var_pop_qty,
        |  var_samp(l_quantity) AS var_samp_qty,
        |  stddev_pop(l_extendedprice) AS std_pop_price,
        |  stddev_samp(l_extendedprice) AS std_samp_price,
        |  covar_pop(l_quantity, l_extendedprice) AS covar_pop_qp,
        |  covar_samp(l_quantity, l_extendedprice) AS covar_samp_qp,
        |  corr(l_quantity, l_extendedprice) AS corr_qp
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag,
        |  cast(count(DISTINCT l_partkey) AS bigint) AS nd_parts,
        |  cast(count(DISTINCT l_suppkey) AS bigint) AS nd_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q_argminmax" ->
      """SELECT o_orderstatus,
        |  max_by(o_custkey, o_orderkey) AS latest_cust,
        |  min_by(o_custkey, o_orderkey) AS first_cust,
        |  max(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, sum_qty NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, sum(o_totalprice) AS sum_price, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, sum_price NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_totals" ->
      """SELECT o_orderstatus, sum(o_totalprice) AS sum_price, count(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus)
        |ORDER BY o_orderstatus NULLS FIRST, sum_price NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_having" ->
      """SELECT l_suppkey, sum(l_quantity) AS total_qty FROM lineitem
        |GROUP BY l_suppkey HAVING sum(l_quantity) > 300
        |ORDER BY l_suppkey NULLS FIRST, total_qty NULLS FIRST""".stripMargin,
    "q_in_subquery" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST, sum_qty NULLS FIRST""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.5
        |ORDER BY c_custkey NULLS FIRST, c_acctbal NULLS FIRST""".stripMargin,
    "q_case_expr" ->
      """SELECT bucket, count(*) AS n FROM (
        |  SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
        |              WHEN o_totalprice > 100000 THEN 'mid'
        |              ELSE 'low' END AS bucket
        |  FROM orders)
        |GROUP BY bucket ORDER BY bucket NULLS FIRST, n NULLS FIRST""".stripMargin
  )
}
