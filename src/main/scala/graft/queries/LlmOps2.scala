package graft.queries

import graft.core.Tables
import graft.llm.TextStats
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, batch 2: RAG-style token chunking,
  * int8 embedding quantization, and an end-to-end corpus-cleaning pass —
  * the composition layer over the round-1 dedup/quality primitives.
  * Everything is per-row expressions or hash aggregation: map-side at
  * 100 TB, no operator sees the whole corpus.
  */
object LlmOps2 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // Token-window chunking (chunk 50, stride 40 => overlap 10): one row
    // per chunk with exact token offsets and an md5 fingerprint of the
    // chunk text — the downstream-join key a RAG/pretraining pipeline
    // needs. posexplode keeps it a single map-side pass.
    "q_doc_chunking" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val toks = split(col("text"), " ")
      val starts = sequence(lit(1), greatest(size(toks), lit(1)), lit(40))
      val chunked = d.select(col("doc_id"), toks.as("toks"),
          posexplode(starts).as(Seq("chunk_idx", "start")))
      val chunk = slice(col("toks"), col("start"), lit(50))
      ordered(chunked.select(
        col("doc_id"), col("chunk_idx"), col("start"),
        size(chunk).as("n_chunk_tokens"),
        md5(array_join(chunk, " ")).as("chunk_md5")))
    },

    // Symmetric int8 quantization of embeddings: scale = 127/max|x|,
    // q = clamp(floor(x*scale + 0.5)) — floor(+0.5) instead of round()
    // so neither engine's tie mode matters. Emits the exact integer
    // checksum plus a reconstruction-error contract.
    "q_embed_quantize" -> { (s, dir) =>
      val e = T(s, dir)("embeddings")
      val v = transform(col("embedding"), x => x.cast("double"))
      val maxAbs = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x)))
      val scale = lit(127.0) / maxAbs
      val q = transform(v, x =>
        greatest(lit(-127L), least(lit(127L), floor(x * scale + 0.5).cast("long"))))
      val deq = zip_with(q, v, (qi, xi) => abs(qi / scale - xi))
      val maxErr = aggregate(deq, lit(0.0), (a, x) => greatest(a, x))
      ordered(e.select(
        col("vec_id"),
        round(scale, 9).as("scale"),
        aggregate(q, lit(0L), (a, x) => a + x).as("q_checksum"),
        (maxErr <= lit(0.5000001) / scale).as("err_within_half_step")))
    },

    // End-to-end corpus cleaning: exact-dedup (keep lowest doc_id per
    // text), length/token filters, then a per-source summary — the
    // hash-groupBy pipeline shape a 100 TB cleaning job uses (two
    // aggregations, no sort, no window).
    "q_llm_pipeline" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val keeper = d.groupBy(col("text").as("t"))
        .agg(min(col("doc_id")).as("keep_id"))
      val kept = d.join(keeper, d("doc_id") === col("keep_id"))
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .filter(length(col("text")) >= 50 && col("n_tokens").between(8, 4000))
      ordered(kept.groupBy(col("source"))
        .agg(count(lit(1)).as("docs_kept"),
          sum(col("n_tokens")).as("total_tokens"),
          round(avg(length(col("text"))), 6).as("avg_len")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_doc_chunking" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |st AS (SELECT doc_id, toks,
        |    unnest(range(1, greatest(len(toks), 1) + 1, 40)) AS start,
        |    generate_subscripts(range(1, greatest(len(toks), 1) + 1, 40), 1) - 1 AS chunk_idx
        |  FROM d)
        |SELECT doc_id, cast(chunk_idx AS int) AS chunk_idx, cast(start AS int) AS start,
        |  cast(len(toks[start:start+49]) AS int) AS n_chunk_tokens,
        |  md5(array_to_string(toks[start:start+49], ' ')) AS chunk_md5
        |FROM st
        |ORDER BY doc_id NULLS FIRST, chunk_idx NULLS FIRST, start NULLS FIRST,
        |  n_chunk_tokens NULLS FIRST, chunk_md5 NULLS FIRST""".stripMargin,
    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |    127.0 / list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
        |q AS (SELECT vec_id, v, scale,
        |    list_transform(v, x -> greatest(-127, least(127,
        |      CAST(floor(x * scale + 0.5) AS BIGINT)))) AS qv
        |  FROM m)
        |SELECT vec_id, round(scale, 9) AS scale,
        |  cast(list_sum(qv) AS BIGINT) AS q_checksum,
        |  list_max(list_transform(range(1, len(v) + 1),
        |    i -> abs(qv[i] / scale - v[i]))) <= 0.5000001 / scale AS err_within_half_step
        |FROM q
        |ORDER BY vec_id NULLS FIRST""".stripMargin,
    "q_llm_pipeline" ->
      """WITH keeper AS (SELECT text t, min(doc_id) keep_id FROM documents GROUP BY text),
        |kept AS (SELECT d.*, len(string_split(text, ' ')) AS n_tokens
        |  FROM documents d JOIN keeper k ON d.doc_id = k.keep_id
        |  WHERE length(text) >= 50 AND len(string_split(text, ' ')) BETWEEN 8 AND 4000)
        |SELECT source, cast(count(*) AS BIGINT) AS docs_kept,
        |  cast(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  round(avg(length(text)), 6) AS avg_len
        |FROM kept GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin
  )
}
