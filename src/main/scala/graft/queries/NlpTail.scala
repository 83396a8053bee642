package graft.queries

import graft.core.Tables
import graft.llm.Nlp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 NLP-classification tail (reference src/Functions/lemmatize.cpp,
  * synonyms.cpp, FunctionsTonalityClassification.cpp,
  * FunctionsProgrammingClassification.cpp): dictionary lemmatization,
  * synonym sets, sentiment and programming-language classification. The
  * oracle dictionaries are rendered from the SAME Scala data (Nlp.sqlMap*)
  * so both engines share one dictionary source. */
object NlpTail {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  /** Fixed inflected sample run through the lemmatizer on every row:
    * irregulars, generated regular forms, and unknowns (identity). */
  private val lemmaSample = Seq("went", "mice", "children", "running",
    "tables", "queries", "merged", "scanning", "batches", "keys", "sorted",
    "joining", "thes", "zzz")

  val queries: Map[String, Q] = Map(
    // Dictionary lemmatization over the leading tokens of each document
    // plus a fixed inflected sample (irregular + regular + unknown forms).
    "q_fn_lemmatize" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val head = slice(split(col("text"), " "), 1, 6)
      val sample = array(lemmaSample.map(lit): _*)
      ordered(d.select(
        col("doc_id"),
        array_join(transform(head, t => Nlp.lemmatize(t)), " ").as("lemma_head"),
        array_join(transform(sample, t => Nlp.lemmatize(t)), " ").as("lemma_sample")))
    },

    // Synonym-set lookup for the 3rd token of each document (full set
    // returned, unknown -> empty array — reference synonyms.cpp contract).
    // The set is rendered as a ','-joined string: the driver comparator
    // only handles scalar columns (round-7 verdict — array columns break
    // its pandas sort), so both engines emit the same stable rendering.
    "q_fn_synonyms" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val w = element_at(split(col("text"), " "), 3)
      ordered(d.select(
        col("doc_id"), w.as("w"), array_join(Nlp.synonyms(w), ",").as("syns")))
    },

    // Sentiment: average emotional-dictionary weight of matched words,
    // rescaled to [-1, 1] (positive /6, negative /12 — the reference's
    // asymmetric -12..6 dictionary range), 0 when nothing matches.
    "q_fn_tonality" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      ordered(d.select(
        col("doc_id"), Nlp.detectTonality(col("text")).as("tone")))
    },

    // Programming-language profile vote: keyword token hits per profile,
    // max wins (earlier profile on ties), no hits -> 'undefined'.
    "q_fn_prog_lang" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      ordered(d.select(
        col("doc_id"),
        Nlp.detectProgrammingLanguage(col("text")).as("lang")))
    },

    // sparseGrams (reference src/Functions/sparseGrams.cpp): content-
    // defined substring anchors. Oracle-checked (round 10): the FNV
    // hashes and the border-domination selection are re-derived
    // declaratively in DuckDB; also pinned by GoldenSpec + the
    // border-domination property test in CodecsSpec.
    "q_fn_sparse_grams" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      ordered(d.select(col("doc_id"),
        array_join(graft.functions.TextHashes.sparse_grams(
          substring(col("text"), 1, 24), 3), ",").as("grams")))
    },

    // End-to-end DIALECT tail (batches 13/14 through ChSql.sql):
    // hasSubstr over token arrays, character ngrams, bit positions,
    // readable time deltas — each independently reproduced in DuckDB.
    "q_fn_dialect_tail" -> { (s, dir) =>
      // arrayStringConcat renders the array results as scalar strings:
      // the driver comparator only handles scalar columns (round-7
      // verdict), and the rendering itself exercises two more dialect
      // names (arrayStringConcat, arrayMap) end-to-end.
      ordered(graft.sqlfront.ChSql.sql(s, dir,
        """SELECT doc_id,
          |  hasSubstr(splitByChar(' ', text), arraySlice(splitByChar(' ', text), 3, 2)) AS hs,
          |  hasSubstr(splitByChar(' ', text), ['zzz_not_there']) AS hs_no,
          |  arrayStringConcat(ngrams(substring(text, 1, 8), 3), ',') AS ng,
          |  arrayStringConcat(arrayMap(x -> toString(x), bitPositionsToArray(n_chars)), ',') AS bp,
          |  formatReadableTimeDelta(n_chars) AS td
          |FROM documents WHERE doc_id < 200""".stripMargin))
    },

    // normalizeQuery (reference src/Functions/normalizeQuery.cpp):
    // literal erasure for query-log fingerprinting — string literals and
    // numbers become '?', literal lists collapse to '?..'. The same
    // regexp chain runs in DuckDB (the 64-bit fingerprint hash is
    // engine-specific xxhash64, pinned in ChSqlSpec instead).
    "q_fn_normalize_query" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val qstr = concat(lit("SELECT * FROM t WHERE id = "), col("doc_id"),
        lit(" AND src = '"), col("source"),
        lit("' AND x IN (1, 2, 3) AND w = 'a b c' LIMIT 5"))
      ordered(d.select(col("doc_id"), Nlp.normalizeQuery(qstr).as("nq")))
    }
  )

  private val lemmaSampleSql = Nlp.sqlList(lemmaSample)

  val oracleSql: Map[String, String] = Map(
    // Full re-derivation of the sparseGrams anchor set in SQL: FNV-1a of
    // every (n-1)-gram via HUGEINT arithmetic (as in q_fingerprint's
    // oracle), then the declarative form of the selection — a substring
    // [i, j+k) is an anchor iff BOTH border gram hashes strictly exceed
    // every interior gram hash (signed 64-bit compare, matching the
    // kernel's Long semantics). The kernel's early-stop walk is a pure
    // optimization of this condition, so the sets are identical.
    "q_fn_sparse_grams" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 24) AS s FROM documents),
        |gi AS (SELECT doc_id, s, unnest(range(greatest(length(s)-1, 0))) AS i FROM t),
        |g0 AS (
        |  SELECT doc_id, s, i,
        |    list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(octet_length(encode(substr(s, CAST(i AS INT)+1, 2)))),
        |          x -> (16*(strpos('0123456789ABCDEF', substr(hex(encode(substr(s, CAST(i AS INT)+1, 2))), 2*x+1, 1))-1)
        |                + strpos('0123456789ABCDEF', substr(hex(encode(substr(s, CAST(i AS INT)+1, 2))), 2*x+2, 1))-1)::HUGEINT)),
        |      (h, b) -> (((h - (h % 256) + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT)) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |    ) AS hu
        |  FROM gi),
        |g AS (
        |  SELECT doc_id, s, i,
        |    CAST(hu - CASE WHEN hu >= 9223372036854775808::HUGEINT
        |              THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS h
        |  FROM g0),
        |pairs AS (
        |  SELECT a.doc_id, a.s, a.i AS i, b.i AS j
        |  FROM g a JOIN g b ON a.doc_id = b.doc_id AND b.i > a.i
        |  WHERE least(a.h, b.h) > COALESCE(
        |    (SELECT max(c.h) FROM g c WHERE c.doc_id = a.doc_id AND c.i > a.i AND c.i < b.i),
        |    -9223372036854775807 - 1)
        |),
        |agg AS (
        |  SELECT doc_id, string_agg(substr(s, CAST(i AS INT)+1, CAST(j - i AS INT) + 2), ',' ORDER BY i, j) AS grams
        |  FROM pairs GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.grams, '') AS grams
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id NULLS FIRST, grams NULLS FIRST""".stripMargin,
    "q_fn_lemmatize" ->
      s"""WITH m AS (SELECT ${Nlp.sqlMap(Nlp.lemmaDict)} AS dict)
         |SELECT doc_id,
         |  array_to_string(list_transform(string_split(text, ' ')[1:6],
         |    t -> coalesce(map_extract(dict, lower(t))[1], lower(t))), ' ') AS lemma_head,
         |  array_to_string(list_transform($lemmaSampleSql,
         |    t -> coalesce(map_extract(dict, lower(t))[1], lower(t))), ' ') AS lemma_sample
         |FROM documents CROSS JOIN m
         |ORDER BY doc_id NULLS FIRST, lemma_head NULLS FIRST,
         |  lemma_sample NULLS FIRST""".stripMargin,
    "q_fn_synonyms" ->
      s"""WITH m AS (SELECT ${Nlp.sqlMapList(Nlp.synPairs)} AS dict)
         |SELECT doc_id, string_split(text, ' ')[3] AS w,
         |  coalesce(array_to_string(
         |    map_extract(dict, lower(string_split(text, ' ')[3]))[1],
         |    ','), '') AS syns
         |FROM documents CROSS JOIN m
         |ORDER BY doc_id NULLS FIRST, w NULLS FIRST, syns NULLS FIRST""".stripMargin,
    "q_fn_tonality" ->
      s"""WITH m AS (SELECT ${Nlp.sqlMapInt(Nlp.tonalityDict)} AS dict),
         |t AS (SELECT doc_id,
         |    list_filter(list_transform(
         |      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''),
         |      x -> map_extract(dict, x)[1]), v -> v IS NOT NULL) AS ws
         |  FROM documents CROSS JOIN m)
         |SELECT doc_id,
         |  CASE WHEN len(ws) = 0 THEN 0.0
         |       WHEN list_sum(ws) > 0 THEN CAST(list_sum(ws) AS DOUBLE) / len(ws) / 6.0
         |       ELSE CAST(list_sum(ws) AS DOUBLE) / len(ws) / 12.0 END AS tone
         |FROM t
         |ORDER BY doc_id NULLS FIRST, tone NULLS FIRST""".stripMargin,
    "q_fn_prog_lang" -> {
      val hits = Nlp.progKeywords.map { case (lang, kws) =>
        s"len(list_filter(toks, x -> list_contains(${Nlp.sqlList(kws)}, x))) AS c_$lang"
      }.mkString(",\n         |    ")
      val langs = Nlp.progKeywords.map(_._1)
      val branches = langs.zipWithIndex.map { case (lang, i) =>
        val later = langs.drop(i + 1).map(o => s"c_$lang >= c_$o")
        val cond = (s"c_$lang > 0" +: later).mkString(" AND ")
        s"WHEN $cond THEN '$lang'"
      }.mkString("\n         |    ")
      s"""WITH t AS (SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
         |  FROM documents),
         |c AS (SELECT doc_id,
         |    $hits
         |  FROM t)
         |SELECT doc_id, CASE
         |    $branches
         |    ELSE 'undefined' END AS lang
         |FROM c
         |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST""".stripMargin
    },
    "q_fn_dialect_tail" ->
      """WITH d AS (SELECT doc_id, text, n_chars,
        |    string_split(text, ' ') AS toks FROM documents WHERE doc_id < 200),
        |s AS (SELECT doc_id, text, n_chars, toks, toks[3:4] AS sub FROM d)
        |SELECT doc_id,
        |  len(list_filter(range(1, len(toks) - len(sub) + 2),
        |    i -> toks[i:i+len(sub)-1] = sub)) > 0 AS hs,
        |  FALSE AS hs_no,
        |  array_to_string(list_transform(
        |    range(1, greatest(length(substring(text, 1, 8)) - 1, 0)),
        |    i -> substring(substring(text, 1, 8), CAST(i AS INT), 3)), ',') AS ng,
        |  array_to_string(list_transform(
        |    list_filter(range(0, 64), i -> (CAST(n_chars AS BIGINT) >> i) & 1 = 1),
        |    x -> CAST(x AS VARCHAR)), ',') AS bp,
        |  array_to_string(list_filter([
        |    CASE WHEN n_chars // 86400 > 0 THEN (n_chars // 86400) || ' days' END,
        |    CASE WHEN n_chars % 86400 // 3600 > 0 THEN (n_chars % 86400 // 3600) || ' hours' END,
        |    CASE WHEN n_chars % 3600 // 60 > 0 THEN (n_chars % 3600 // 60) || ' minutes' END,
        |    CASE WHEN n_chars % 60 > 0 OR n_chars = 0 THEN (n_chars % 60) || ' seconds' END],
        |    x -> x IS NOT NULL), ', ') AS td
        |FROM s
        |ORDER BY doc_id NULLS FIRST, hs NULLS FIRST, hs_no NULLS FIRST,
        |  ng NULLS FIRST, bp NULLS FIRST, td NULLS FIRST""".stripMargin,
    "q_fn_normalize_query" ->
      """WITH q AS (SELECT doc_id,
        |    'SELECT * FROM t WHERE id = ' || doc_id || ' AND src = ''' || source
        |    || ''' AND x IN (1, 2, 3) AND w = ''a b c'' LIMIT 5' AS qs
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(qs,
        |    '''([^''\\]|\\.)*''', '?', 'g'),
        |    '\b[0-9]+(\.[0-9]+)?\b', '?', 'g'),
        |    '\?(\s*,\s*\?)+', '?..', 'g') AS nq
        |FROM q
        |ORDER BY doc_id NULLS FIRST, nq NULLS FIRST""".stripMargin
  )
}
