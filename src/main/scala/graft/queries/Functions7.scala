package graft.queries

import graft.core.Tables
import graft.functions.StringDistances
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 string-distance tail (reference
  * src/Functions/FunctionsStringDistance.cpp: damerauLevenshteinDistance,
  * jaroSimilarity, jaroWinklerSimilarity, byteHammingDistance,
  * stringJaccardIndex). Oracle: DuckDB's native damerau_levenshtein /
  * jaro(_winkler)_similarity / hamming / jaccard.
  */
object Functions7 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    "q_fn_string_distance" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val t = col("text")
      val s1 = substring(t, 1, 12)
      // first-two-character swap of s1: a pure transposition case where
      // Damerau < Levenshtein
      val s2 = concat(substring(t, 2, 1), substring(t, 1, 1), substring(t, 3, 10))
      val s3 = substring(t, 5, 12)
      val s4 = substring(t, 1, 20)
      // shares an 8-char prefix with s1: exercises the Winkler boost path
      val s5 = concat(substring(t, 1, 8), lit("zzzz"))
      ordered(d.select(
        col("doc_id"),
        levenshtein(s1, s3).as("lev"),
        StringDistances.damerau_levenshtein(s1, s2).as("dl_swap"),
        StringDistances.damerau_levenshtein(s1, s3).as("dl"),
        round(StringDistances.jaro_similarity(s1, s3), 9).as("jaro"),
        round(StringDistances.jaro_winkler_similarity(s1, s3), 9).as("jw"),
        round(StringDistances.jaro_winkler_similarity(s1, s5), 9).as("jw_boost"),
        StringDistances.byte_hamming(s1, s2).as("bh"),
        StringDistances.byte_hamming(s3, s4).as("bh_unequal"),
        round(StringDistances.string_jaccard(s1, s3), 9).as("jac")))
    },

    // extractTextFromHTML (reference src/Functions/extractTextFromHTML.cpp):
    // both engines build the same HTML document from row data, then run
    // the identical strip chain (two script/style passes, comments,
    // CDATA, tags, entity decode, whitespace collapse).
    "q_fn_html_extract" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val html = concat(
        lit("<html><head><script type=\"text/javascript\">var x = 1 < 2;</script>"),
        lit("<style>p { color: red }</style></head><body><h1>"),
        col("source"), lit("</h1><!-- doc "), col("doc_id").cast("string"),
        lit(" --><p>"), substring(col("text"), 1, 80),
        lit(" &amp; more &lt;stuff&gt; &quot;quoted&quot;&nbsp;end</p>"),
        lit("<![CDATA[raw <bytes>]]></body></html>"))
      ordered(d.select(col("doc_id"),
        graft.functions.Html.extract_text_from_html(html).as("txt")))
    },

    // widthBucket (reference src/Functions/widthBucket.cpp): Spark's
    // native width_bucket vs an independent closed-form emulation in
    // DuckDB — equal-width histogram bucketing incl. the out-of-range
    // buckets 0 and n+1.
    "q_fn_width_bucket" -> { (s, dir) =>
      val l = T(s, dir)("lineitem").filter(col("l_orderkey") <= 2000)
      ordered(l.select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        width_bucket(col("l_extendedprice"), lit(0.0), lit(100000.0), lit(20)).as("wb"),
        width_bucket(col("l_discount"), lit(0.02), lit(0.08), lit(6)).as("wb_edge"),
        width_bucket(col("l_quantity"), lit(100.0), lit(0.0), lit(10)).as("wb_desc")))
    },

    // Exact Decimal aggregation (reference Decimal32/64/128 sum semantics
    // — DataTypeDecimalBase): fixed-point sums are EXACT, no FP drift,
    // any partial-aggregation order gives the identical result. Spark's
    // Tungsten decimal sum vs DuckDB's DECIMAL(38,2) sum. The final
    // decimals are rendered as fixed-scale STRINGS on both sides so the
    // compare is engine-stable (decimal value canonicalization differs
    // between arrow/duckdb renderers; the string form pins scale).
    "q_agg_decimal_exact" -> { (s, dir) =>
      val l = T(s, dir)("lineitem")
      val price = col("l_extendedprice").cast("decimal(18,2)")
      val disc = col("l_discount").cast("decimal(18,2)")
      ordered(l.groupBy(col("l_returnflag")).agg(
        sum(price).cast("decimal(38,2)").cast("string").as("s_price"),
        sum(price * disc).cast("decimal(38,4)").cast("string").as("s_disc"),
        count(price).as("n")))
    },

    // hasSubsequence (reference src/Functions/hasSubsequence.cpp) — the
    // codegen fold the ChSql template emits, oracle-checked against an
    // INDEPENDENT formulation (DuckDB regex with '.*'-joined chars; the
    // fixture text is [a-zA-Z0-9 ] only, so needles are regex-safe).
    "q_fn_subsequence" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      def subseq(n: String) =
        s"aggregate(split(text, ''), 0, (p, c) -> " +
          s"IF(p < length($n) AND c = substring($n, p + 1, 1), p + 1, p)) = length($n)"
      ordered(d.selectExpr("doc_id",
        subseq("substring(text, 5, 3)") + " AS s_in",
        subseq("reverse(substring(text, 1, 4))") + " AS s_rev",
        subseq("'zqxjkw'") + " AS s_rare"))
    },

    // base32 (RFC 4648) + bech32 (BIP-0173) codec tail: decode∘encode
    // round trips and the encoded-length arithmetic are oracle-checkable;
    // exact encoded vectors are pinned in CodecsSpec (RFC §10 strings,
    // the BIP-0173 P2WPKH address). bech32Decode renders
    // 'hrp:witver:hex(program)' — reproduced exactly in DuckDB.
    "q_fn_codec_tail" -> { (s, dir) =>
      import graft.functions.Encodings
      val c = T(s, dir)("customer").filter(col("c_custkey") <= 2000)
      val b32 = Encodings.base32Encode(col("c_name"))
      ordered(c.select(
        col("c_custkey"), col("c_name"),
        Encodings.base32Decode(b32).as("rt32"),
        length(b32).cast("int").as("b32_len"),
        Encodings.bech32Decode(Encodings.bech32Encode(
          lit("bc"), substring(col("c_name"), 1, 10))).as("bech_rt")))
    },

    // End-to-end DIALECT date math (batch-11 templates through
    // ChSql.sql): Modified-Julian-Day round trip + changeYear, vs
    // DuckDB's native date arithmetic.
    "q_fn_mjd" -> { (s, dir) =>
      ordered(graft.sqlfront.ChSql.sql(s, dir,
        """SELECT o_orderkey,
          |  toModifiedJulianDay(o_orderdate) AS mjd,
          |  fromModifiedJulianDay(toModifiedJulianDay(o_orderdate) + 10) AS d10,
          |  changeYear(o_orderdate, 2000) AS cy
          |FROM orders WHERE o_orderkey < 500""".stripMargin))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_fn_string_distance" ->
      """WITH d AS (SELECT doc_id,
        |    substring(text, 1, 12) AS s1,
        |    substring(text, 2, 1) || substring(text, 1, 1) || substring(text, 3, 10) AS s2,
        |    substring(text, 5, 12) AS s3,
        |    substring(text, 1, 20) AS s4,
        |    substring(text, 1, 8) || 'zzzz' AS s5
        |  FROM documents)
        |SELECT doc_id,
        |  cast(levenshtein(s1, s3) AS int) AS lev,
        |  cast(damerau_levenshtein(s1, s2) AS int) AS dl_swap,
        |  cast(damerau_levenshtein(s1, s3) AS int) AS dl,
        |  round(jaro_similarity(s1, s3), 9) AS jaro,
        |  round(jaro_winkler_similarity(s1, s3), 9) AS jw,
        |  round(jaro_winkler_similarity(s1, s5), 9) AS jw_boost,
        |  cast(hamming(s1, s2) AS int) AS bh,
        |  cast(hamming(s3, substring(s4, 1, 12)) + 8 AS int) AS bh_unequal,
        |  round(jaccard(s1, s3), 9) AS jac
        |FROM d
        |ORDER BY doc_id NULLS FIRST, lev NULLS FIRST, dl_swap NULLS FIRST, dl NULLS FIRST,
        |  jaro NULLS FIRST, jw NULLS FIRST, jw_boost NULLS FIRST, bh NULLS FIRST,
        |  bh_unequal NULLS FIRST, jac NULLS FIRST""".stripMargin,
    "q_fn_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><script type="text/javascript">var x = 1 < 2;</script>'
        |  || '<style>p { color: red }</style></head><body><h1>'
        |  || source || '</h1><!-- doc ' || doc_id
        |  || ' --><p>' || substring(text, 1, 80)
        |  || ' &amp; more &lt;stuff&gt; &quot;quoted&quot;&nbsp;end</p>'
        |  || '<![CDATA[raw <bytes>]]></body></html>' AS x
        |  FROM documents)
        |SELECT doc_id, trim(regexp_replace(
        |  replace(replace(replace(replace(replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      x, '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
        |      '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '(?s)<!\[CDATA\[.*?\]\]>', ' ', 'g'),
        |      '(?s)<[^>]*>', ' ', 'g'),
        |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS txt
        |FROM h
        |ORDER BY doc_id NULLS FIRST, txt NULLS FIRST""".stripMargin,
    "q_fn_width_bucket" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(CASE WHEN l_extendedprice < 0.0 THEN 0
        |    WHEN l_extendedprice >= 100000.0 THEN 21
        |    ELSE floor(20 * (l_extendedprice - 0.0) / (100000.0 - 0.0)) + 1 END AS BIGINT) AS wb,
        |  CAST(CASE WHEN l_discount < 0.02 THEN 0
        |    WHEN l_discount >= 0.08 THEN 7
        |    ELSE floor(6 * (l_discount - 0.02) / (0.08 - 0.02)) + 1 END AS BIGINT) AS wb_edge,
        |  CAST(CASE WHEN l_quantity > 100.0 THEN 0
        |    WHEN l_quantity <= 0.0 THEN 11
        |    ELSE floor(10 * (100.0 - l_quantity) / (100.0 - 0.0)) + 1 END AS BIGINT) AS wb_desc
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |  l_extendedprice NULLS FIRST, wb NULLS FIRST, wb_edge NULLS FIRST,
        |  wb_desc NULLS FIRST""".stripMargin,
    "q_agg_decimal_exact" ->
      """SELECT l_returnflag,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS s_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS VARCHAR) AS s_disc,
        |  count(l_extendedprice) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST, s_price NULLS FIRST,
        |  s_disc NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_fn_subsequence" ->
      """SELECT doc_id,
        |  regexp_matches(text, array_to_string(string_split(substring(text, 5, 3), ''), '.*')) AS s_in,
        |  regexp_matches(text, array_to_string(string_split(reverse(substring(text, 1, 4)), ''), '.*')) AS s_rev,
        |  regexp_matches(text, 'z.*q.*x.*j.*k.*w') AS s_rare
        |FROM documents
        |ORDER BY doc_id NULLS FIRST, s_in NULLS FIRST, s_rev NULLS FIRST,
        |  s_rare NULLS FIRST""".stripMargin,
    "q_fn_mjd" ->
      """SELECT o_orderkey,
        |  CAST(datediff('day', DATE'1858-11-17', CAST(o_orderdate AS DATE)) AS INT) AS mjd,
        |  CAST(o_orderdate AS DATE) + 10 AS d10,
        |  make_date(2000, month(o_orderdate), day(o_orderdate)) AS cy
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey NULLS FIRST, mjd NULLS FIRST, d10 NULLS FIRST,
        |  cy NULLS FIRST""".stripMargin,
    "q_fn_codec_tail" ->
      """SELECT c_custkey, c_name,
        |  c_name AS rt32,
        |  CAST(8 * ceil(length(c_name) / 5.0) AS INT) AS b32_len,
        |  'bc:0:' || lower(hex(CAST(substring(c_name, 1, 10) AS BLOB))) AS bech_rt
        |FROM customer WHERE c_custkey <= 2000
        |ORDER BY c_custkey NULLS FIRST, c_name NULLS FIRST, rt32 NULLS FIRST,
        |  b32_len NULLS FIRST, bech_rt NULLS FIRST""".stripMargin
  )
}
