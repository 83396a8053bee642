package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** corrMatrix / boundingRatio / bar (SURVEY.md §2.4 matrices + misc,
  * §2.8 introspection).
  */
object Misc3 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // corrMatrix (reference registerAggregateFunctions.cpp:55): full
    // pairwise correlation matrix of three measures, exploded to rows —
    // one aggregation pass computes all cells.
    "q_corr_matrix" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val cols0 = Seq("l_quantity", "l_extendedprice", "l_discount")
      val cells = for (a <- cols0; b <- cols0) yield
        corr(col(a), col(b)).as(s"c_${a}_$b")
      val wide = li.agg(cells.head, cells.tail: _*)
      val rows = cols0.flatMap(a => cols0.map(b =>
        struct(lit(a).as("x"), lit(b).as("y"), col(s"c_${a}_$b").as("r"))))
      ordered(wide.select(explode(array(rows: _*)).as("cell"))
        .select(col("cell.x"), col("cell.y"), col("cell.r")))
    },

    // boundingRatio (reference :58): slope of the bounding box of
    // (x=orderkey, y=totalprice) per status.
    "q_bounding_ratio" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      ordered(o.groupBy(col("o_orderstatus"))
        .agg(((max(col("o_totalprice")) - min(col("o_totalprice"))) /
          (max(col("o_orderkey")) - min(col("o_orderkey")))).as("bounding_ratio")))
    },

    // bar (reference bar.cpp): unicode bar chart of per-status counts,
    // width 20, deterministic integer arithmetic.
    "q_fn_bar" -> { (s, dir) =>
      val o = T(s, dir)("orders")
      val counts = o.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val total = counts.agg(max(col("n")).as("mx"))
      ordered(counts.crossJoin(broadcast(total))
        .select(col("o_orderstatus"), col("n"),
          // block count = floor(n * 20 / max)
          concat(lit(""),
            expr("repeat('#', cast(n * 20 div mx AS int))")).as("bar")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_corr_matrix" ->
      """WITH w AS (SELECT
        |  corr(l_quantity, l_quantity) AS c11, corr(l_quantity, l_extendedprice) AS c12,
        |  corr(l_quantity, l_discount) AS c13,
        |  corr(l_extendedprice, l_quantity) AS c21, corr(l_extendedprice, l_extendedprice) AS c22,
        |  corr(l_extendedprice, l_discount) AS c23,
        |  corr(l_discount, l_quantity) AS c31, corr(l_discount, l_extendedprice) AS c32,
        |  corr(l_discount, l_discount) AS c33
        |FROM lineitem)
        |SELECT x, y, r FROM (
        |  SELECT 'l_quantity' x, 'l_quantity' y, c11 r FROM w UNION ALL
        |  SELECT 'l_quantity', 'l_extendedprice', c12 FROM w UNION ALL
        |  SELECT 'l_quantity', 'l_discount', c13 FROM w UNION ALL
        |  SELECT 'l_extendedprice', 'l_quantity', c21 FROM w UNION ALL
        |  SELECT 'l_extendedprice', 'l_extendedprice', c22 FROM w UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', c23 FROM w UNION ALL
        |  SELECT 'l_discount', 'l_quantity', c31 FROM w UNION ALL
        |  SELECT 'l_discount', 'l_extendedprice', c32 FROM w UNION ALL
        |  SELECT 'l_discount', 'l_discount', c33 FROM w)
        |ORDER BY x NULLS FIRST, y NULLS FIRST, r NULLS FIRST""".stripMargin,
    "q_bounding_ratio" ->
      """SELECT o_orderstatus,
        |  (max(o_totalprice) - min(o_totalprice))
        |    / (max(o_orderkey) - min(o_orderkey)) AS bounding_ratio
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST""".stripMargin,
    "q_fn_bar" ->
      """WITH c AS (SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1),
        |m AS (SELECT max(n) AS mx FROM c)
        |SELECT o_orderstatus, n, repeat('#', cast(n * 20 // mx AS int)) AS bar
        |FROM c, m
        |ORDER BY o_orderstatus NULLS FIRST, n NULLS FIRST, bar NULLS FIRST""".stripMargin
  )
}
