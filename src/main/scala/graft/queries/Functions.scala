package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.8; reference src/Functions/ —
  * ~1500 names across 604 files). Each query exercises one family via
  * `org.apache.spark.sql.functions` (codegen'd built-ins — the committed
  * mapping for ~85% of the reference surface), verified value-by-value
  * against DuckDB's independent implementations.
  */
object Functions {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // String core (reference lower/upper/substring/trim/concat/pad/...).
    "q_fn_string_core" -> { (s, dir) =>
      val p = T(s, dir)("part").filter(col("p_partkey") < 500)
      ordered(p.select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 3, 5).as("sub"),
        trim(lit("  pad  ")).as("trimmed"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
        concat_ws("-", col("p_brand"), col("p_type")).as("catws"),
        reverse(col("p_brand")).as("rev"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "*").as("rp"),
        repeat(lit("ab"), 3).as("rep"),
        initcap(lower(col("p_type"))).as("ic"),
        ascii(col("p_brand")).as("asc_code"),
        translate(col("p_type"), "AEO", "aeo").as("tr")))
    },

    // String search (position/startsWith/endsWith/like family).
    "q_fn_string_search" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      ordered(d.select(
        col("doc_id"),
        instr(col("text"), "data").as("pos_data"),
        col("text").startsWith("key").as("sw"),
        col("text").endsWith("value").as("ew"),
        col("text").contains("spark").as("has_spark"),
        col("source").like("src1%").as("lk"),
        locate("row", col("text"), 5).as("loc_row")))
    },

    // Regex (replace/extract/count/split).
    "q_fn_regex" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      ordered(d.select(
        col("doc_id"),
        regexp_replace(col("source"), "[0-9]+", "N").as("src_norm"),
        regexp_extract(col("source"), "src([0-9]+)", 1).as("src_num"),
        col("source").rlike("^src[0-4]$").as("low_src"),
        size(split(col("text"), " ")).as("n_tokens"),
        array_join(slice(split(col("text"), " "), 1, 3), "_").as("first3")))
    },

    // Math (reference src/Functions/ exp/log/sqrt/trig/pow/round family).
    "q_fn_math" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_orderkey") < 300)
      val x = col("l_extendedprice")
      // Float outputs are emitted as SCALED LONGS — floor(f*1e6 + 0.5) — not
      // round(): Spark's round (BigDecimal HALF_UP) and DuckDB's round
      // (scale-multiply) can disagree on half-way doubles, while multiply and
      // floor are IEEE-exact and bit-identical across engines.
      def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5)
      ordered(li.select(
        col("l_orderkey"), col("l_linenumber"), x.as("x"),
        abs(-x).as("abs_x"),
        floor(x * 10 + 0.5).as("round1"),
        floor(x).as("fl"),
        ceil(x).as("ce"),
        s6(sqrt(x)).as("sq"),
        s6(exp(x / 100000)).as("ex"),
        s6(log(x)).as("ln_x"),
        s6(log10(x)).as("lg"),
        s6(pow(x, 0.5)).as("pw"),
        s6(sin(x / 1000)).as("sn"),
        s6(cos(x / 1000)).as("cs"),
        s6(atan(x / 1000)).as("at"),
        signum(x - 30000).as("sg"),
        (pmod(col("l_orderkey"), lit(7))).as("pm")))
    },

    // Date/time extract + arithmetic (reference toYear/.../dateDiff/date_trunc).
    "q_fn_datetime" -> { (s, dir) =>
      val o = T(s, dir)("orders").filter(col("o_orderkey") < 500)
      val ts = col("o_orderdate")
      ordered(o.select(
        col("o_orderkey"),
        year(ts).as("y"),
        quarter(ts).as("q"),
        month(ts).as("m"),
        dayofmonth(ts).as("d"),
        (dayofweek(ts)).as("dow"),
        dayofyear(ts).as("doy"),
        weekofyear(ts).as("woy"),
        date_trunc("month", ts).as("mon_start"),
        last_day(ts).as("mon_end"),
        date_add(ts, 30).as("plus30"),
        datediff(lit("2002-01-01").cast("timestamp"), ts).as("days_to_2002")))
    },

    // Conversions incl. failure → NULL (reference FunctionsConversion
    // accurateCastOrNull → try_cast).
    "q_fn_conversion" -> { (s, dir) =>
      val p = T(s, dir)("part").filter(col("p_partkey") < 500)
      ordered(p.select(
        col("p_partkey"),
        col("p_partkey").cast("string").as("as_str"),
        concat(lit("00"), col("p_partkey").cast("string")).cast("long").as("back_long"),
        expr("try_cast(p_type AS int)").as("bad_int"),
        expr("try_cast(regexp_extract(p_brand, '([0-9]+)', 1) AS int)").as("brand_num"),
        col("p_size").cast("double").as("size_d"),
        floor(col("p_retailprice")).cast("long").as("price_floor")))
    },

    // Hashing (reference FunctionsHashing.h) — md5 / sha2-256 have
    // cross-engine canonical values.
    "q_fn_hash" -> { (s, dir) =>
      val c = T(s, dir)("customer").filter(col("c_custkey") < 300)
      ordered(c.select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("h_md5"),
        sha2(col("c_name").cast("binary"), 256).as("h_sha256")))
    },

    // Conditionals (reference if/multiIf/coalesce/nullIf/greatest/least).
    "q_fn_conditional" -> { (s, dir) =>
      val c = T(s, dir)("customer")
      ordered(c.select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("(machine)")).as("seg"),
        when(col("c_acctbal") < 0, "debt").otherwise("credit").as("std"),
        greatest(col("c_acctbal"), lit(0.0)).as("pos_bal"),
        least(col("c_acctbal"), lit(0.0)).as("neg_bal"),
        isnull(nullif(col("c_nationkey"), lit(7))).as("is_n7")))
    },

    // JSON extraction (reference FunctionsJSON.cpp) on events.props.
    "q_fn_json" -> { (s, dir) =>
      val e = T(s, dir)("events").filter(col("event_id") < 2000)
      ordered(e.select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)
        ))).getField("k").as("k_struct"),
        json_array_length(concat(lit("[1,2,"), get_json_object(col("props"), "$.k"), lit("]"))).as("jal")))
    },

    // Array higher-order functions (reference src/Functions/array/) over
    // tokenized text — outputs kept scalar for cross-engine stability.
    "q_fn_array_hof" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val toks = split(col("text"), " ")
      ordered(d.select(
        col("doc_id"),
        size(toks).as("n_tok"),
        size(array_distinct(toks)).as("n_uniq"),
        size(filter(toks, t => length(t) > 4)).as("n_long"),
        exists(toks, t => t === "spark").as("has_spark"),
        forall(toks, t => length(t) < 20).as("all_short"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("total_chars"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_contains(toks, "table").as("has_table"),
        size(array_intersect(toks, array(lit("spark"), lit("table"), lit("row")))).as("n_kw")))
    },

    // Array numeric kernels over embeddings (reference arrayDistance.cpp /
    // arrayDotProduct — the embedding-pipeline path): L2 norm, mean, dot
    // with self via sequential fold (same evaluation order both engines).
    "q_fn_array_vec" -> { (s, dir) =>
      val e = T(s, dir)("embeddings")
      val vd = transform(col("embedding"), x => x.cast("double"))
      ordered(e.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first"),
        sqrt(aggregate(vd, lit(0.0), (a, x) => a + x * x)).as("l2"),
        (aggregate(vd, lit(0.0), (a, x) => a + x) / size(col("embedding"))).as("mean"),
        aggregate(vd, lit(0.0), (a, x) => a + abs(x)).as("l1")))
    },

    // Bit operations (reference bitAnd/bitOr/bitShift/bitCount).
    "q_fn_bits" -> { (s, dir) =>
      val o = T(s, dir)("orders").filter(col("o_orderkey") < 1000)
      val k = col("o_orderkey")
      ordered(o.select(
        k,
        (k.bitwiseAND(255)).as("band"),
        (k.bitwiseOR(16)).as("bor"),
        (k.bitwiseXOR(col("o_custkey"))).as("bxor"),
        shiftleft(k, 2).as("shl"),
        shiftright(k, 1).as("shr"),
        bit_count(k).as("popcnt")))
    },

    // Encoding (reference base64/hex family).
    "q_fn_encoding" -> { (s, dir) =>
      val n = T(s, dir)("nation")
      ordered(n.select(
        col("n_nationkey"),
        base64(col("n_name").cast("binary")).as("b64"),
        unbase64(base64(col("n_name").cast("binary"))).cast("string").as("roundtrip"),
        hex(col("n_name").cast("binary")).as("hx"),
        unhex(hex(col("n_name").cast("binary"))).cast("string").as("hx_rt")))
    },

    // String distance (reference FunctionsStringDistance.cpp levenshtein).
    "q_fn_levenshtein" -> { (s, dir) =>
      val p = T(s, dir)("part").filter(col("p_partkey") < 500)
      ordered(p.select(
        col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).as("lev_bt"),
        levenshtein(col("p_type"), lit("STANDARD")).as("lev_std")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_fn_string_core" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lo, upper(p_brand) AS up,
        |  cast(length(p_name) AS int) AS len,
        |  substring(p_name, 3, 5) AS sub,
        |  trim('  pad  ') AS trimmed,
        |  p_brand || '#' || p_type AS cat,
        |  concat_ws('-', p_brand, p_type) AS catws,
        |  reverse(p_brand) AS rev,
        |  lpad(p_brand, 12, '*') AS lp,
        |  rpad(p_brand, 12, '*') AS rp,
        |  repeat('ab', 3) AS rep,
        |  upper(substring(lower(p_type),1,1)) || substring(lower(p_type),2) AS ic,
        |  ascii(p_brand) AS asc_code,
        |  translate(p_type, 'AEO', 'aeo') AS tr
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey NULLS FIRST""".stripMargin,
    "q_fn_string_search" ->
      """SELECT doc_id,
        |  cast(instr(text, 'data') AS int) AS pos_data,
        |  starts_with(text, 'key') AS sw,
        |  ends_with(text, 'value') AS ew,
        |  contains(text, 'spark') AS has_spark,
        |  source LIKE 'src1%' AS lk,
        |  cast(coalesce(nullif(instr(substring(text, 5), 'row'), 0) + 4, 0) AS int) AS loc_row
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q_fn_regex" ->
      """SELECT doc_id,
        |  regexp_replace(source, '[0-9]+', 'N', 'g') AS src_norm,
        |  regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
        |  regexp_matches(source, '^src[0-4]$') AS low_src,
        |  cast(len(string_split(text, ' ')) AS int) AS n_tokens,
        |  array_to_string(string_split(text, ' ')[1:3], '_') AS first3
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice AS x,
        |  abs(-l_extendedprice) AS abs_x,
        |  CAST(floor(l_extendedprice * 10 + 0.5) AS BIGINT) AS round1,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  CAST(floor(sqrt(l_extendedprice) * 1e6 + 0.5) AS BIGINT) AS sq,
        |  CAST(floor(exp(l_extendedprice / 100000) * 1e6 + 0.5) AS BIGINT) AS ex,
        |  CAST(floor(ln(l_extendedprice) * 1e6 + 0.5) AS BIGINT) AS ln_x,
        |  CAST(floor(log10(l_extendedprice) * 1e6 + 0.5) AS BIGINT) AS lg,
        |  CAST(floor(pow(l_extendedprice, 0.5) * 1e6 + 0.5) AS BIGINT) AS pw,
        |  CAST(floor(sin(l_extendedprice / 1000) * 1e6 + 0.5) AS BIGINT) AS sn,
        |  CAST(floor(cos(l_extendedprice / 1000) * 1e6 + 0.5) AS BIGINT) AS cs,
        |  CAST(floor(atan(l_extendedprice / 1000) * 1e6 + 0.5) AS BIGINT) AS at,
        |  CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS sg,
        |  l_orderkey % 7 AS pm
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, x NULLS FIRST""".stripMargin,
    "q_fn_datetime" ->
      """SELECT o_orderkey,
        |  cast(year(o_orderdate) AS int) AS y,
        |  cast(quarter(o_orderdate) AS int) AS q,
        |  cast(month(o_orderdate) AS int) AS m,
        |  cast(day(o_orderdate) AS int) AS d,
        |  cast(date_part('dow', o_orderdate) AS int) + 1 AS dow,
        |  cast(date_part('doy', o_orderdate) AS int) AS doy,
        |  cast(weekofyear(o_orderdate) AS int) AS woy,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
        |  last_day(CAST(o_orderdate AS DATE)) AS mon_end,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  cast(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS int) AS days_to_2002
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,
    "q_fn_conversion" ->
      """SELECT p_partkey,
        |  cast(p_partkey AS varchar) AS as_str,
        |  cast('00' || cast(p_partkey AS varchar) AS bigint) AS back_long,
        |  try_cast(p_type AS int) AS bad_int,
        |  try_cast(regexp_extract(p_brand, '([0-9]+)', 1) AS int) AS brand_num,
        |  cast(p_size AS double) AS size_d,
        |  cast(floor(p_retailprice) AS bigint) AS price_floor
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey NULLS FIRST""".stripMargin,
    "q_fn_hash" ->
      """SELECT c_custkey,
        |  md5(c_name) AS h_md5,
        |  sha256(c_name) AS h_sha256
        |FROM customer WHERE c_custkey < 300
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,
    "q_fn_conditional" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'MACHINERY'), '(machine)') AS seg,
        |  CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS std,
        |  greatest(c_acctbal, 0.0) AS pos_bal,
        |  least(c_acctbal, 0.0) AS neg_bal,
        |  nullif(c_nationkey, 7) IS NULL AS is_n7
        |FROM customer
        |ORDER BY c_custkey NULLS FIRST, seg NULLS FIRST, std NULLS FIRST, pos_bal NULLS FIRST, neg_bal NULLS FIRST, is_n7 NULLS FIRST""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        |  cast(json_extract_string(props, '$.k') AS bigint) AS k_val,
        |  cast(json_extract_string(props, '$.k') AS bigint) AS k_struct,
        |  cast(json_array_length('[1,2,' || json_extract_string(props, '$.k') || ']') AS int) AS jal
        |FROM events WHERE event_id < 2000
        |ORDER BY event_id NULLS FIRST""".stripMargin,
    "q_fn_array_hof" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  cast(len(toks) AS int) AS n_tok,
        |  cast(len(list_distinct(toks)) AS int) AS n_uniq,
        |  cast(len(list_filter(toks, t -> length(t) > 4)) AS int) AS n_long,
        |  len(list_filter(toks, t -> t = 'spark')) > 0 AS has_spark,
        |  len(list_filter(toks, t -> length(t) >= 20)) = 0 AS all_short,
        |  cast(list_sum(list_transform(toks, t -> length(t))) AS bigint) AS total_chars,
        |  toks[1] AS first_tok,
        |  toks[-1] AS last_tok,
        |  list_contains(toks, 'table') AS has_table,
        |  cast(len(list_intersect(toks, ['spark','table','row'])) AS int) AS n_kw
        |FROM t
        |ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q_fn_array_vec" ->
      """WITH t AS (SELECT vec_id, embedding,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings)
        |SELECT vec_id,
        |  cast(len(embedding) AS int) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first,
        |  sqrt(list_sum(list_transform(vd, x -> x * x))) AS l2,
        |  list_sum(vd) / len(embedding) AS mean,
        |  list_sum(list_transform(vd, x -> abs(x))) AS l1
        |FROM t
        |ORDER BY vec_id NULLS FIRST""".stripMargin,
    "q_fn_bits" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 16 AS bor,
        |  xor(o_orderkey, o_custkey) AS bxor,
        |  o_orderkey << 2 AS shl,
        |  o_orderkey >> 1 AS shr,
        |  cast(bit_count(o_orderkey) AS int) AS popcnt
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,
    "q_fn_encoding" ->
      """SELECT n_nationkey,
        |  base64(encode(n_name)) AS b64,
        |  decode(from_base64(base64(encode(n_name)))) AS roundtrip,
        |  hex(n_name) AS hx,
        |  decode(unhex(hex(n_name))) AS hx_rt
        |FROM nation
        |ORDER BY n_nationkey NULLS FIRST""".stripMargin,
    "q_fn_levenshtein" ->
      """SELECT p_partkey,
        |  cast(levenshtein(p_brand, p_type) AS int) AS lev_bt,
        |  cast(levenshtein(p_type, 'STANDARD') AS int) AS lev_std
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey NULLS FIRST""".stripMargin
  )
}
