package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining inventory rows: ARRAY JOIN (row-expanding unnest), table
  * functions (numbers/generate_series), statistical tests
  * (welchTTest / mannWhitneyUTest — SURVEY.md §2.4 ML/stat family,
  * composed from relational primitives rather than custom state).
  */
object Misc {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // ARRAY JOIN (reference ArrayJoinTransform): explode tokens, global
    // token frequencies over a bounded doc range.
    "q_array_join" -> { (s, dir) =>
      val d = T(s, dir)("documents").filter(col("doc_id") < 100)
      ordered(d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 20))
    },

    // posexplode — LEFT ARRAY JOIN with position (reference
    // arrayEnumerate + ARRAY JOIN).
    "q_array_join_pos" -> { (s, dir) =>
      val d = T(s, dir)("documents").filter(col("doc_id") < 20)
      ordered(d.select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 5)))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
        .select(col("doc_id"), (col("p") + 1).as("p"), col("tok")))
    },

    // numbers()/generate_series table function (reference
    // src/TableFunctions/) -> spark.range; arithmetic aggregation proves
    // the generated content.
    "q_table_numbers" -> { (s, dir) =>
      s.range(0, 100000)
        .filter(pmod(col("id"), lit(7)) === 0)
        .agg(count(lit(1)).as("n"), sum(col("id")).as("total"),
          avg(col("id")).as("mean"))
    },

    // Welch two-sample t-test statistic for l_quantity between return
    // flags 'A' and 'R' (reference welchTTest) — pure aggregation math.
    "q_welch_ttest" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_returnflag").isin("A", "R"))
      val stats = li.groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("m"),
          var_samp(col("l_quantity")).as("v"),
          count(lit(1)).cast("double").as("n"))
      val a = stats.filter(col("l_returnflag") === "A")
        .select(col("m").as("m1"), col("v").as("v1"), col("n").as("n1"))
      val r = stats.filter(col("l_returnflag") === "R")
        .select(col("m").as("m2"), col("v").as("v2"), col("n").as("n2"))
      val j = a.crossJoin(r)
      j.select(
        ((col("m1") - col("m2")) /
          sqrt(col("v1") / col("n1") + col("v2") / col("n2"))).as("t_stat"),
        (pow(col("v1") / col("n1") + col("v2") / col("n2"), 2) /
          (pow(col("v1") / col("n1"), 2) / (col("n1") - 1) +
           pow(col("v2") / col("n2"), 2) / (col("n2") - 1))).as("dof"))
    },

    // Mann-Whitney U statistic (reference mannWhitneyUTest): midranks via
    // value-level grouping (deterministic, tie-aware), U for group 'A'.
    "q_mann_whitney" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("g"), col("l_quantity").as("x"))
      val byVal = li.groupBy(col("x"))
        .agg(count(lit(1)).as("c"),
          sum(when(col("g") === "A", 1).otherwise(0)).as("ca"))
      // Rank prefix via the scale-safe running total (x is distinct after
      // the groupBy, so the range-partition prefix is well-defined); the
      // u statistic rounds to 3 decimals on both sides since the
      // distributed fold order of the final double sum is not the
      // oracle's sequential one.
      val ranked = graft.ops.Ops.runningTotalExclusive(byVal, col("x"), col("c"), "cum_before")
        .withColumn("midrank", col("cum_before") + (col("c") + 1) / 2.0)
      ranked.agg(
        (sum(col("midrank") * col("ca"))).as("rank_sum_a"),
        sum(col("ca")).as("n_a"))
        .select(
          round(col("rank_sum_a") - col("n_a") * (col("n_a") + 1) / 2.0, 3).as("u_stat"),
          col("n_a").cast("long").as("n_a"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_array_join" ->
      """SELECT tok, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id < 100)
        |GROUP BY tok HAVING count(*) >= 20
        |ORDER BY tok NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_array_join_pos" ->
      """SELECT doc_id, p, toks[p] AS tok FROM (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    unnest(range(1, least(len(string_split(text, ' ')), 5) + 1)) AS p
        |  FROM documents WHERE doc_id < 20)
        |ORDER BY doc_id NULLS FIRST, p NULLS FIRST, tok NULLS FIRST""".stripMargin,
    "q_table_numbers" ->
      """SELECT count(*) AS n, cast(sum(i) AS bigint) AS total, avg(i) AS mean
        |FROM (SELECT unnest(range(0, 100000)) AS i) WHERE i % 7 = 0""".stripMargin,
    "q_welch_ttest" ->
      """WITH s AS (SELECT l_returnflag, avg(l_quantity) m, var_samp(l_quantity) v,
        |    count(*)::DOUBLE n FROM lineitem WHERE l_returnflag IN ('A','R')
        |  GROUP BY l_returnflag)
        |SELECT (a.m - r.m) / sqrt(a.v/a.n + r.v/r.n) AS t_stat,
        |  pow(a.v/a.n + r.v/r.n, 2) /
        |    (pow(a.v/a.n, 2)/(a.n-1) + pow(r.v/r.n, 2)/(r.n-1)) AS dof
        |FROM (SELECT * FROM s WHERE l_returnflag='A') a,
        |     (SELECT * FROM s WHERE l_returnflag='R') r""".stripMargin,
    "q_mann_whitney" ->
      """WITH li AS (SELECT l_returnflag g, l_quantity x FROM lineitem
        |  WHERE l_returnflag IN ('A','R')),
        |bv AS (SELECT x, count(*) c,
        |    sum(CASE WHEN g='A' THEN 1 ELSE 0 END) ca
        |  FROM li GROUP BY x),
        |rk AS (SELECT x, c, ca,
        |    coalesce(sum(c) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_before
        |  FROM bv)
        |SELECT round(sum((cum_before + (c+1)/2.0) * ca)
        |    - sum(ca) * (sum(ca)+1) / 2.0, 3) AS u_stat,
        |  cast(sum(ca) AS bigint) AS n_a
        |FROM rk""".stripMargin
  )
}
