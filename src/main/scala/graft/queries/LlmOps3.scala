package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM training-data pipeline, batch 3: corpus quality filters and split
  * assignment — the Gopher/C4-style repetition signals (Rae et al. 2021
  * §A1.1), PII redaction, and deterministic hash-based train/val/test
  * splits every large-scale data pipeline needs.
  *
  * Scale posture: repetition + redaction are pure per-row expression
  * pipelines (map-side, whole-stage codegen, no shuffle); the top-word
  * fraction is one explode + two keyed aggs (shuffles on doc_id only);
  * the split assignment is a map-side hash + one tiny count agg.
  */
object LlmOps3 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // Gopher repetition filters: per document, the fraction of duplicate
    // word 3-grams and the fraction of the document occupied by its most
    // frequent word. Documents below both thresholds keep=true.
    "q_quality_repetition" -> { (s, dir) =>
      val d = T(s, dir)("documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
      val grams = d.withColumn("n3", size(col("w")) - 2)
        .withColumn("dup_trigram_frac",
          round(lit(1.0) - size(array_distinct(transform(
            sequence(lit(1), col("n3")),
            i => concat_ws(" ", element_at(col("w"), i),
              element_at(col("w"), i + 1), element_at(col("w"), i + 2)))))
            .cast("double") / col("n3"), 6))
      val words = d.select(col("doc_id"), size(col("w")).as("nw"),
          explode(col("w")).as("word"))
      val topw = words.groupBy(col("doc_id"), col("nw"), col("word"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("nw")).agg(max(col("c")).as("topc"))
        .select(col("doc_id").as("d2"),
          round(col("topc").cast("double") / col("nw"), 6).as("top_word_frac"))
      ordered(grams.join(topw, col("doc_id") === col("d2"))
        .select(col("doc_id"), col("dup_trigram_frac"), col("top_word_frac"),
          (col("dup_trigram_frac") < 0.3 && col("top_word_frac") < 0.2).as("keep")))
    },

    // PII redaction: strip emails and long digit runs. The fixture corpus
    // is clean, so a deterministic synthetic email + phone is appended
    // per document before redaction to exercise the patterns.
    "q_pii_redact" -> { (s, dir) =>
      val d = T(s, dir)("documents")
        .select(col("doc_id"),
          concat(substring(col("text"), 1, 40),
            lit(" contact user"), col("doc_id"), lit("@example.com or 555-01"),
            lpad(col("doc_id") % 100, 2, "0"), lit(" now")).as("t"))
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{4,}"
      ordered(d.select(col("doc_id"),
        regexp_count(col("t"), lit(emailRe)).as("n_emails"),
        regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("redacted")))
    },

    // Benchmark decontamination: flag corpus documents sharing any word
    // 5-gram with a (small) benchmark set — the standard eval-overlap
    // check before training. Benchmark grams are distinct'd then
    // broadcast; the corpus side is a map-side explode + one doc_id agg,
    // so nothing large ever shuffles. (At 100 TB the join key would be a
    // 64-bit gram hash instead of the gram string — same plan shape.)
    "q_decontaminate" -> { (s, dir) =>
      val docs = T(s, dir)("documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
      def grams(df: DataFrame) = df
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("w")) - 4),
          i => concat_ws(" ", (0 to 4).map(k => element_at(col("w"), i + k)): _*)))
          .as("gram"))
      val bench = grams(docs.filter(col("doc_id") % 50 === 0))
        .select(col("gram")).distinct()
      val corpus = grams(docs.filter(col("doc_id") % 50 =!= 0))
      val hits = corpus.join(broadcast(bench), Seq("gram"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
      val base = docs.filter(col("doc_id") % 50 =!= 0).select(col("doc_id"))
      ordered(base.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated")))
    },

    // Deterministic train/val/test split: md5 over a salted doc key,
    // first-two-hex-chars ranges give a reproducible ~81/10/9 split that
    // is stable across engines, partitionings and reruns.
    "q_train_split" -> { (s, dir) =>
      val d = T(s, dir)("documents")
        .withColumn("h", substring(md5(concat(lit("graft-split-v1:"),
          col("doc_id").cast("string"))), 1, 2))
      val tagged = d.withColumn("split",
        when(col("h") < "d0", "train").when(col("h") < "e8", "val").otherwise("test"))
      ordered(tagged.groupBy(col("split")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_quality_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |g AS (SELECT doc_id, len(w) - 2 AS n3,
        |    round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS DOUBLE)
        |      / (len(w) - 2), 6) AS dup_trigram_frac
        |  FROM d),
        |words AS (SELECT doc_id, len(w) AS nw, unnest(w) AS word FROM d),
        |wc AS (SELECT doc_id, nw, word, count(*) AS c FROM words GROUP BY 1, 2, 3),
        |tw AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / nw, 6) AS top_word_frac
        |  FROM wc GROUP BY doc_id, nw)
        |SELECT g.doc_id AS doc_id, dup_trigram_frac, top_word_frac,
        |  dup_trigram_frac < 0.3 AND top_word_frac < 0.2 AS keep
        |FROM g JOIN tw ON g.doc_id = tw.doc_id
        |ORDER BY doc_id NULLS FIRST, dup_trigram_frac NULLS FIRST,
        |  top_word_frac NULLS FIRST, keep NULLS FIRST""".stripMargin,
    "q_pii_redact" ->
      """WITH d AS (SELECT doc_id,
        |    substring(text, 1, 40) || ' contact user' || doc_id ||
        |    '@example.com or 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |    || ' now' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  cast(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{4,}', '<PHONE>', 'g') AS redacted
        |FROM d
        |ORDER BY doc_id NULLS FIRST, n_emails NULLS FIRST, redacted NULLS FIRST""".stripMargin,
    "q_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))
        |    AS gram FROM d),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |corpus AS (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0),
        |hits AS (SELECT doc_id, count(*) AS n_overlap FROM corpus
        |  WHERE gram IN (SELECT gram FROM bench) GROUP BY doc_id)
        |SELECT d.doc_id AS doc_id,
        |  cast(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
        |  coalesce(n_overlap, 0) > 0 AS contaminated
        |FROM d LEFT JOIN hits ON d.doc_id = hits.doc_id
        |WHERE d.doc_id % 50 <> 0
        |ORDER BY doc_id NULLS FIRST, n_overlap NULLS FIRST, contaminated NULLS FIRST""".stripMargin,
    "q_train_split" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    substring(md5('graft-split-v1:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h
        |  FROM documents),
        |t AS (SELECT CASE WHEN h < 'd0' THEN 'train'
        |    WHEN h < 'e8' THEN 'val' ELSE 'test' END AS split, n_chars
        |  FROM d)
        |SELECT split, count(*) AS n_docs, cast(sum(n_chars) AS BIGINT) AS n_chars
        |FROM t GROUP BY split
        |ORDER BY split NULLS FIRST, n_docs NULLS FIRST, n_chars NULLS FIRST""".stripMargin
  )
}
