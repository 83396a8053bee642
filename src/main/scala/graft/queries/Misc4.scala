package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** transform() value remap + regexp counting (SURVEY.md §2.8
  * introspection/regex rows). */
object Misc4 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // transform(x, [from...], [to...], default) (reference transform.cpp)
    // == lookup in a literal map with a default.
    "q_fn_value_remap" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val m = map_from_arrays(
        array(lit("click"), lit("view"), lit("purchase")),
        array(lit(10), lit(20), lit(30)))
      ordered(e.select(coalesce(element_at(m, col("event_type")), lit(-1)).as("code"))
        .groupBy(col("code")).agg(count(lit(1)).as("n")))
    },

    // arrayDifference / arrayCumSum (reference array/arrayDifference.cpp,
    // arrayCumSum.cpp) over the 64-dim embeddings — emitted as scalar
    // checksums of the result arrays (sum/first/last) for comparison
    // stability.
    "q_fn_array_scan" -> { (s, dir) =>
      val e = T(s, dir)("embeddings")
      val vd = transform(col("embedding"), x => x.cast("double"))
      val n = size(vd)
      val diff = transform(sequence(lit(1), n), i =>
        when(i === 1, lit(0.0)).otherwise(
          element_at(vd, i) - element_at(vd, i - 1)))
      val cums = transform(sequence(lit(1), n), i =>
        aggregate(slice(vd, lit(1), i), lit(0.0), (a, x) => a + x))
      ordered(e.select(
        col("vec_id"),
        aggregate(diff, lit(0.0), (a, x) => a + abs(x)).as("diff_l1"),
        element_at(cums, 1).as("cum_first"),
        element_at(cums, -1).as("cum_last")))
    },

    // countMatches / regexp_extract_all / regexp_instr-style position.
    "q_fn_regex_count" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      ordered(d.select(
        col("doc_id"),
        regexp_count(col("text"), lit("[aeiou]{2}")).as("n_double_vowel"),
        size(regexp_extract_all(col("text"), lit("\\b\\w{5}\\b"), lit(0))).as("n_five_letter"),
        regexp_count(col("text"), lit("row")).as("n_row")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_fn_value_remap" ->
      """SELECT code, count(*) AS n FROM (
        |  SELECT CASE event_type WHEN 'click' THEN 10 WHEN 'view' THEN 20
        |    WHEN 'purchase' THEN 30 ELSE -1 END AS code
        |  FROM events)
        |GROUP BY code ORDER BY code NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_fn_array_scan" ->
      """WITH t AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |d AS (SELECT vec_id, vd,
        |    list_transform(range(1, len(vd) + 1),
        |      i -> CASE WHEN i = 1 THEN 0.0 ELSE vd[i] - vd[i-1] END) AS diff,
        |    list_transform(range(1, len(vd) + 1),
        |      i -> list_sum(vd[1:i])) AS cums
        |  FROM t)
        |SELECT vec_id,
        |  list_sum(list_transform(diff, x -> abs(x))) AS diff_l1,
        |  cums[1] AS cum_first,
        |  cums[-1] AS cum_last
        |FROM d
        |ORDER BY vec_id NULLS FIRST""".stripMargin,
    "q_fn_regex_count" ->
      """SELECT doc_id,
        |  cast(len(regexp_extract_all(text, '[aeiou]{2}')) AS bigint) AS n_double_vowel,
        |  cast(len(regexp_extract_all(text, '\b\w{5}\b')) AS int) AS n_five_letter,
        |  cast(len(regexp_extract_all(text, 'row')) AS bigint) AS n_row
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin
  )
}
