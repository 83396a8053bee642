package graft.queries

import graft.core.Tables
import graft.llm.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation pipeline operators, batch 4: BM25 relevance
  * scoring, deterministic stratified sampling, fixed-budget sequence
  * packing, and per-language rebalancing (graft.llm.Corpus). All four
  * have exact DuckDB oracles.
  */
object LlmOps4 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(

    // Okapi BM25 of every document against the corpus's 3 most frequent
    // words (deterministic term pick: count desc, word asc). Scores are
    // emitted as scaled longs — bit-exact across engines.
    "q_bm25" -> { (s, dir) =>
      val d = T(s, dir)("documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val words = d.select(explode(col("toks")).as("word"))
      val terms = words.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc).limit(3)
      val scored = Corpus.bm25(d, col("doc_id"), col("toks"), terms)
      ordered(scored.select(col("doc_id"), col("dl"),
        floor(col("score") * 1e6 + 0.5).as("s6")))
    },

    // Stratified sampling: per-language keep fractions (en 1/2, zh 1/4,
    // default 1/8) decided by a salted md5 threshold — reproducible,
    // map-side, no RNG.
    "q_stratified_sample" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val kept = Corpus.stratifiedSample(d, col("lang"), col("doc_id"),
        Map("en" -> 0.5, "zh" -> 0.25), 0.125)
      ordered(kept.groupBy(col("lang")).agg(
        count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept")))
    },

    // Sequence packing: documents in doc_id order fill consecutive
    // 4096-token bins by exclusive prefix count (two-phase running
    // total, no single-partition window).
    "q_seq_packing" -> { (s, dir) =>
      val d = T(s, dir)("documents")
        .select(col("doc_id"), size(split(col("text"), " ")).as("tok"))
      val packed = Corpus.packSequences(d, col("doc_id"), col("tok"), 4096L)
      ordered(packed.groupBy(col("bin")).agg(
        count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens")))
    },

    // Language rebalancing: deterministic uniform subsample of at most
    // 80 documents per language (salted-hash rank), reported against the
    // pre-rebalance totals.
    "q_lang_rebalance" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val kept = Corpus.rebalance(d, col("lang"), col("doc_id"), 80)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      val tot = d.groupBy(col("lang").as("l2")).agg(count(lit(1)).as("n_total"))
      ordered(kept.join(tot, col("lang") === col("l2"))
        .select(col("lang"), col("n_kept"), col("n_total")))
    },

    // Cross-table fuzzy join: near-duplicate pairs between the even-id
    // "corpus" and odd-id "new batch" halves via banded MinHash + exact
    // verification — oracle is the exact O(n^2) cross Jaccard.
    "q_fuzzy_join" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val corpus = d.filter(pmod(col("doc_id"), lit(2)) === 0)
      val batch = d.filter(pmod(col("doc_id"), lit(2)) === 1)
      ordered(graft.llm.Dedup.minhashLshJoin(
        corpus, batch, "doc_id", "text", threshold = 0.7))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |base AS (SELECT doc_id, CAST(len(toks) AS INT) AS dl, toks FROM d),
        |w AS (SELECT doc_id, dl, unnest(toks) AS word FROM base),
        |tf AS (SELECT doc_id, dl, word, count(*) AS tf FROM w GROUP BY 1, 2, 3),
        |allw AS (SELECT word, count(*) AS cnt FROM w GROUP BY 1),
        |terms AS (SELECT word FROM allw ORDER BY cnt DESC, word LIMIT 3),
        |dft AS (SELECT word, count(*) AS df FROM tf
        |  WHERE word IN (SELECT word FROM terms) GROUP BY 1),
        |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
        |contrib AS (SELECT doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2
        |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS c
        |  FROM tf JOIN dft USING (word), st),
        |sc AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY 1)
        |SELECT b.doc_id AS doc_id, b.dl AS dl,
        |  CAST(floor(coalesce(score, 0.0) * 1e6 + 0.5) AS BIGINT) AS s6
        |FROM base b LEFT JOIN sc ON b.doc_id = sc.doc_id
        |ORDER BY doc_id NULLS FIRST, dl NULLS FIRST, s6 NULLS FIRST""".stripMargin,
    "q_stratified_sample" ->
      """SELECT lang, cast(count(*) AS BIGINT) AS n_kept,
        |  cast(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM documents
        |WHERE substring(md5('graft-strat-v1:' || CAST(doc_id AS VARCHAR)), 1, 4)
        |  < CASE lang WHEN 'en' THEN '8000' WHEN 'zh' THEN '4000' ELSE '2000' END
        |GROUP BY lang
        |ORDER BY lang NULLS FIRST, n_kept NULLS FIRST, chars_kept NULLS FIRST""".stripMargin,
    "q_seq_packing" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, coalesce(sum(tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM d)
        |SELECT CAST(floor(cum / 4096) AS BIGINT) AS bin,
        |  cast(count(*) AS BIGINT) AS n_docs, cast(sum(tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1
        |ORDER BY bin NULLS FIRST, n_docs NULLS FIRST, n_tokens NULLS FIRST""".stripMargin,
    "q_lang_rebalance" ->
      """WITH r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5('graft-rebal-v1:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents),
        |k AS (SELECT lang, cast(count(*) AS BIGINT) AS n_kept FROM r
        |  WHERE rn <= 80 GROUP BY lang),
        |t AS (SELECT lang, cast(count(*) AS BIGINT) AS n_total FROM documents GROUP BY lang)
        |SELECT k.lang AS lang, n_kept, n_total FROM k JOIN t ON k.lang = t.lang
        |ORDER BY lang NULLS FIRST, n_kept NULLS FIRST, n_total NULLS FIRST""".stripMargin,
    "q_fuzzy_join" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |    ELSE [array_to_string(toks, ' ')] END AS g FROM d)
        |SELECT a, b, jaccard FROM (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |    len(list_intersect(x.g, y.g))::DOUBLE / len(list_distinct(x.g || y.g)) AS jaccard
        |  FROM sh x JOIN sh y ON x.doc_id % 2 = 0 AND y.doc_id % 2 = 1)
        |WHERE jaccard >= 0.7
        |ORDER BY a NULLS FIRST, b NULLS FIRST, jaccard NULLS FIRST""".stripMargin
  )
}
