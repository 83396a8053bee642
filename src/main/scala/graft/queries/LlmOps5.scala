package graft.queries

import graft.core.Tables
import graft.llm.{Corpus, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 LLM-pipeline batch: IVF ANN, boilerplate filtering, vocabulary
  * coverage, executable UDFs. */
object LlmOps5 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // IVF ANN at nprobe = nlist scans every cell, so it must equal exact
    // brute-force top-k — which DuckDB recomputes independently. The
    // pruned configuration (nprobe < nlist) is recall-asserted in LlmSpec.
    "q_sim_ann_ivf" -> { (s, dir) =>
      Similarity.annTopKIvf(T(s, dir)("embeddings"), "vec_id", "embedding",
        queryId = 1L, k = 8, nlist = 16, nprobe = 16)
    },

    // CCNet-flavored boilerplate-document filter (shared token trigrams).
    "q_boilerplate_filter" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      ordered(Corpus.boilerplateStats(
        d, col("doc_id"), split(col("text"), " "), docFrac = 0.3))
    },

    // Vocabulary coverage curve (top 20 tokens by corpus frequency with
    // cumulative occurrence share) — scale-safe running total, no global
    // window.
    "q_vocab_coverage" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      ordered(Corpus.vocabCoverage(d, split(col("text"), " "), topK = 20))
    },

    // Executable UDF (reference UserDefinedExecutableFunction.cpp): pipe
    // a column through `tr` one process per partition; the oracle
    // recomputes with SQL upper() — proving the round-trip through an
    // external process is exact.
    "q_exec_udf" -> { (s, dir) =>
      val c = T(s, dir)("customer").filter(col("c_custkey") <= 2000)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      ordered(graft.ops.ExecutableUdf.pipeColumn(
        c, "c_name", "upper_name", Seq("tr", "[:lower:]", "[:upper:]")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_sim_ann_ivf" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT y.vec_id AS vec_id,
        |  list_sum(list_transform(range(1, 65), i -> x.v[i] * y.v[i]))
        |    / (sqrt(list_sum(list_transform(x.v, t -> t * t)))
        |       * sqrt(list_sum(list_transform(y.v, t -> t * t)))) AS cos
        |FROM e x JOIN e y ON x.vec_id = 1 AND y.vec_id <> 1
        |ORDER BY cos DESC, y.vec_id LIMIT 8""".stripMargin,
    "q_boilerplate_filter" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS t
        |    FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS tri
        |    FROM base, unnest(range(1, len(t) - 1)) AS u(i)),
        |nd AS (SELECT count(*) AS n_docs FROM base),
        |freq AS (SELECT tri, count(*) > (SELECT n_docs FROM nd) * 0.3 AS is_freq
        |    FROM tri GROUP BY tri)
        |SELECT doc_id,
        |  cast(count(*) AS bigint) AS n_tri,
        |  cast(sum(CASE WHEN is_freq THEN 1 ELSE 0 END) AS bigint) AS n_freq,
        |  cast(floor(1000000 * sum(CASE WHEN is_freq THEN 1 ELSE 0 END) / count(*)) AS bigint)
        |    AS frac_ppm,
        |  floor(1000000 * sum(CASE WHEN is_freq THEN 1 ELSE 0 END) / count(*)) <= 800000
        |    AS kept
        |FROM tri JOIN freq USING (tri)
        |GROUP BY doc_id
        |ORDER BY doc_id NULLS FIRST, n_tri NULLS FIRST, n_freq NULLS FIRST,
        |  frac_ppm NULLS FIRST, kept NULLS FIRST""".stripMargin,
    "q_vocab_coverage" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |r AS (SELECT tok, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, tok) AS rnk,
        |    sum(cnt) OVER (ORDER BY cnt DESC, tok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt
        |  FROM f),
        |tot AS (SELECT sum(cnt) AS total_cnt FROM f)
        |SELECT cast(rnk AS bigint) AS rnk, tok, cast(cnt AS bigint) AS cnt,
        |  cast(cum_cnt AS bigint) AS cum_cnt,
        |  cast(floor(1000000 * cum_cnt / total_cnt) AS bigint) AS covered_ppm
        |FROM r, tot WHERE rnk <= 20
        |ORDER BY rnk NULLS FIRST, tok NULLS FIRST, cnt NULLS FIRST,
        |  cum_cnt NULLS FIRST, covered_ppm NULLS FIRST""".stripMargin,
    "q_exec_udf" ->
      """SELECT c_custkey, c_name, c_mktsegment, upper(c_name) AS upper_name
        |FROM customer WHERE c_custkey <= 2000
        |ORDER BY c_custkey NULLS FIRST, c_name NULLS FIRST, c_mktsegment NULLS FIRST,
        |  upper_name NULLS FIRST""".stripMargin
  )
}
