package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Function surface batch 4 (SURVEY.md §2.8 rounding family + §2.4
  * cardinality): banker's rounding, precision rounding, roundToExp2,
  * roundDuration-style bucketing; HLL approximate distinct vs exact.
  */
object Functions4 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // Rounding family (reference FunctionsRound.h): round (half-up),
    // bround (banker's), negative-precision round, roundToExp2,
    // roundDuration-style bucket.
    "q_fn_rounding" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_orderkey") < 300)
      val x = col("l_extendedprice")
      ordered(li.select(
        col("l_orderkey"), col("l_linenumber"), x.as("x"),
        round(x, 0).as("r0"),
        round(x, -2).as("rneg2"),
        bround(col("l_quantity") / 2, 0).as("br_half"),  // qty/2 is exactly representable -> tie behavior comparable
        pow(lit(2.0), floor(log(x) / log(lit(2.0)))).as("exp2"),
        when(x < 1000, 0).when(x < 10000, 1000).when(x < 50000, 10000)
          .otherwise(50000).as("dur_bucket")))
    },

    // uniq (HLL++) against exact distinct: values can't hash-match across
    // engines, so the query emits BOTH and the oracle checks the exact
    // column while the approx column is bounds-checked (within 5% of
    // exact, turned into a boolean that must agree).
    "q_uniq_approx" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_nd"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_nd"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("approx_nd") - col("exact_nd")).cast("double") /
            col("exact_nd") <= 0.05).as("approx_within_5pct")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_fn_rounding" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice AS x,
        |  round(l_extendedprice, 0) AS r0,
        |  round(l_extendedprice, -2) AS rneg2,
        |  round_even(l_quantity / 2, 0) AS br_half,
        |  pow(2.0, floor(ln(l_extendedprice) / ln(2.0))) AS exp2,
        |  CASE WHEN l_extendedprice < 1000 THEN 0
        |       WHEN l_extendedprice < 10000 THEN 1000
        |       WHEN l_extendedprice < 50000 THEN 10000
        |       ELSE 50000 END AS dur_bucket
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, x NULLS FIRST""".stripMargin,
    "q_uniq_approx" ->
      """SELECT l_returnflag,
        |  cast(count(DISTINCT l_partkey) AS bigint) AS exact_nd,
        |  true AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  )
}
