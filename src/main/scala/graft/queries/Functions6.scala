package graft.queries

import graft.core.Tables
import graft.functions.{IntMath, SpaceCurves}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 scalar tail: integer gcd/lcm, space-filling-curve codecs,
  * JSON introspection, AES encryption (SURVEY.md §2.8 math / geo-index /
  * JSON / encryption rows). */
object Functions6 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // gcd / lcm (reference src/Functions/gcd.cpp, lcm.cpp) — custom
    // codegen Expressions; DuckDB has native gcd/lcm for the oracle.
    "q_fn_gcd_lcm" -> { (s, dir) =>
      val l = T(s, dir)("lineitem").filter(col("l_orderkey") <= 2000)
      ordered(l.select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        IntMath.gcd(col("l_partkey"), col("l_suppkey")).as("g"),
        IntMath.lcm(pmod(col("l_partkey"), lit(50)), col("l_linenumber")).as("m"),
        IntMath.gcd(lit(0), lit(0)).as("g00"),
        IntMath.lcm(col("l_suppkey"), lit(0)).as("m0")))
    },

    // mortonEncode/Decode + hilbertEncode/Decode (reference
    // src/Functions/mortonEncode.cpp, hilbertEncode.cpp). The morton code
    // itself is oracle-checked value-for-value (DuckDB computes the bit
    // interleave directly); hilbert is pinned by decode∘encode == identity
    // here plus known-vector goldens in SpaceCurvesSpec.
    "q_fn_space_curves" -> { (s, dir) =>
      val p = T(s, dir)("part")
      val x = pmod(col("p_partkey"), lit(65536)).cast("long")
      val y = pmod(col("p_partkey") * 2654435761L + col("p_size"), lit(65536)).cast("long")
      val m = SpaceCurves.mortonEncode(x, y)
      val md = SpaceCurves.mortonDecode(m)
      val h = SpaceCurves.hilbertEncode(x, y)
      val hd = SpaceCurves.hilbertDecode(h)
      ordered(p.select(
        col("p_partkey"), x.as("x"), y.as("y"),
        m.as("morton"),
        element_at(md, 1).as("mdx"), element_at(md, 2).as("mdy"),
        element_at(hd, 1).as("hdx"), element_at(hd, 2).as("hdy")))
    },

    // JSON introspection tail (reference src/Functions/FunctionsJSON.cpp:
    // JSONExtractKeys, JSONLength, JSONType, JSONExtractRaw, nested
    // paths). JSON built from row data so both engines derive identical
    // documents, then introspected down to scalars.
    "q_fn_json2" -> { (s, dir) =>
      val o = T(s, dir)("orders").filter(col("o_orderkey") <= 4000)
      val j = to_json(struct(
        col("o_orderkey").as("k"),
        array(col("o_custkey"), pmod(col("o_orderkey"), lit(7)).cast("long")).as("arr"),
        struct(col("o_orderstatus").as("s")).as("nest")))
      val arrRaw = get_json_object(j, "$.arr")
      ordered(o.select(
        col("o_orderkey"),
        size(json_object_keys(j)).as("n_keys"),
        array_join(json_object_keys(j), ",").as("keys_csv"),
        json_array_length(arrRaw).as("arr_len"),
        get_json_object(j, "$.arr[0]").cast("long").as("arr0"),
        get_json_object(j, "$.nest.s").as("nest_s"),
        // JSONType classification of the raw extract: '[' => Array
        when(substring(trim(arrRaw), 1, 1) === "[", lit("Array"))
          .when(substring(trim(arrRaw), 1, 1) === "{", lit("Object"))
          .otherwise(lit("Scalar")).as("arr_type")))
    },

    // Bitmap family end-to-end through the dialect (reference
    // FunctionsBitmap.h / AggregateFunctionGroupBitmap.cpp — set algebra
    // over sorted-distinct arrays; see ChSql batch 9). Per user: the code
    // set, plus intersection / difference cardinalities of the even- and
    // odd-event sub-bitmaps. Oracle recomputes with two-level distinct
    // aggregation.
    "q_fn_bitmap" -> { (s, dir) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT user_id,
          |  bitmapCardinality(bitmapBuild(groupArray(code))) AS card,
          |  bitmapAndCardinality(bitmapBuild(groupArray(code_even)),
          |    bitmapBuild(groupArray(code_odd))) AS n_and,
          |  bitmapAndnotCardinality(bitmapBuild(groupArray(code_even)),
          |    bitmapBuild(groupArray(code_odd))) AS n_even_only,
          |  bitmapMin(bitmapBuild(groupArray(code))) AS mn,
          |  bitmapMax(bitmapBuild(groupArray(code))) AS mx
          |FROM (SELECT user_id,
          |    CAST(event_id % 50 AS BIGINT) AS code,
          |    CASE WHEN event_id % 2 = 0 THEN CAST(event_id % 50 AS BIGINT) END AS code_even,
          |    CASE WHEN event_id % 2 = 1 THEN CAST(event_id % 50 AS BIGINT) END AS code_odd
          |  FROM events)
          |GROUP BY user_id
          |ORDER BY user_id NULLS FIRST, card NULLS FIRST, n_and NULLS FIRST,
          |  n_even_only NULLS FIRST, mn NULLS FIRST, mx NULLS FIRST""".stripMargin)
    },

    // base58Encode/Decode + idnaEncode (reference
    // src/Functions/FunctionBase58Conversion.cpp, idna.cpp). The decode∘
    // encode roundtrip and the encoded length arithmetic are both
    // oracle-checkable; exact encoded values are pinned against public
    // vectors in CodecsSpec.
    "q_fn_base58" -> { (s, dir) =>
      import graft.functions.Encodings
      val c = T(s, dir)("customer").filter(col("c_custkey") <= 2000)
      val enc = Encodings.base58Encode(col("c_name"))
      ordered(c.select(
        col("c_custkey"), col("c_name"),
        Encodings.base58Decode(enc).as("roundtrip"),
        Encodings.idnaEncode(concat(lower(regexp_replace(col("c_name"),
          "[^A-Za-z0-9]", "")), lit(".example.com"))).as("idna")))
    },

    // encrypt / decrypt (reference src/Functions/FunctionsAES.h — CH
    // encrypt('aes-128-ecb', plain, key)). Spark's aes_encrypt in ECB
    // mode is deterministic, so the ciphertext length and the
    // decrypt∘encrypt roundtrip are both oracle-checkable; the oracle
    // reconstructs the plaintext and PKCS#7 padded length arithmetic.
    "q_fn_encrypt" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val snip = substring(col("text"), 1, 24)
      ordered(d.select(
          col("doc_id"), snip.as("snippet"))
        .withColumn("ct_b64", expr(
          "base64(aes_encrypt(snippet, '0123456789abcdef', 'ECB'))"))
        .select(
          col("doc_id"), col("snippet"),
          expr("cast(aes_decrypt(unbase64(ct_b64), '0123456789abcdef', 'ECB') AS string)")
            .as("roundtrip"),
          length(col("ct_b64")).as("ct_b64_len")))
    }
  )

  /** DuckDB expression for the 16-bit morton interleave of columns x, y. */
  private def mortonSql(x: String, y: String): String =
    (0 until 16).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" | ")

  val oracleSql: Map[String, String] = Map(
    "q_fn_gcd_lcm" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  gcd(l_partkey, l_suppkey) AS g,
        |  lcm(l_partkey % 50, l_linenumber) AS m,
        |  CAST(0 AS BIGINT) AS g00,
        |  CAST(0 AS BIGINT) AS m0
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, l_partkey NULLS FIRST,
        |  l_suppkey NULLS FIRST, g NULLS FIRST, m NULLS FIRST, g00 NULLS FIRST, m0 NULLS FIRST""".stripMargin,
    "q_fn_space_curves" ->
      s"""WITH t AS (SELECT p_partkey,
         |    CAST(p_partkey % 65536 AS BIGINT) AS x,
         |    CAST((p_partkey * 2654435761 + p_size) % 65536 AS BIGINT) AS y
         |  FROM part)
         |SELECT p_partkey, x, y,
         |  CAST(${mortonSql("x", "y")} AS BIGINT) AS morton,
         |  x AS mdx, y AS mdy, x AS hdx, y AS hdy
         |FROM t
         |ORDER BY p_partkey NULLS FIRST, x NULLS FIRST, y NULLS FIRST, morton NULLS FIRST,
         |  mdx NULLS FIRST, mdy NULLS FIRST, hdx NULLS FIRST, hdy NULLS FIRST""".stripMargin,
    "q_fn_json2" ->
      """WITH t AS (SELECT o_orderkey,
        |    to_json(struct_pack(k := o_orderkey,
        |      arr := [o_custkey, CAST(o_orderkey % 7 AS BIGINT)],
        |      nest := struct_pack(s := o_orderstatus))) AS j
        |  FROM orders WHERE o_orderkey <= 4000)
        |SELECT o_orderkey,
        |  CAST(len(json_keys(j)) AS int) AS n_keys,
        |  array_to_string(json_keys(j), ',') AS keys_csv,
        |  CAST(json_array_length(j, '$.arr') AS int) AS arr_len,
        |  CAST(j ->> '$.arr[0]' AS BIGINT) AS arr0,
        |  j ->> '$.nest.s' AS nest_s,
        |  CASE WHEN json_type(j, '$.arr') = 'ARRAY' THEN 'Array'
        |       WHEN json_type(j, '$.arr') = 'OBJECT' THEN 'Object'
        |       ELSE 'Scalar' END AS arr_type
        |FROM t
        |ORDER BY o_orderkey NULLS FIRST, n_keys NULLS FIRST, keys_csv NULLS FIRST,
        |  arr_len NULLS FIRST, arr0 NULLS FIRST, nest_s NULLS FIRST, arr_type NULLS FIRST""".stripMargin,
    "q_fn_bitmap" ->
      """WITH b AS (SELECT user_id, CAST(event_id % 50 AS BIGINT) AS code,
        |    max(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS has_even,
        |    max(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS has_odd
        |  FROM events GROUP BY user_id, event_id % 50)
        |SELECT user_id,
        |  CAST(count(*) AS INT) AS card,
        |  CAST(sum(CASE WHEN has_even = 1 AND has_odd = 1 THEN 1 ELSE 0 END) AS INT) AS n_and,
        |  CAST(sum(CASE WHEN has_even = 1 AND has_odd = 0 THEN 1 ELSE 0 END) AS INT)
        |    AS n_even_only,
        |  min(code) AS mn, max(code) AS mx
        |FROM b GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, card NULLS FIRST, n_and NULLS FIRST,
        |  n_even_only NULLS FIRST, mn NULLS FIRST, mx NULLS FIRST""".stripMargin,
    "q_fn_base58" ->
      """SELECT c_custkey, c_name,
        |  c_name AS roundtrip,
        |  lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) || '.example.com' AS idna
        |FROM customer WHERE c_custkey <= 2000
        |ORDER BY c_custkey NULLS FIRST, c_name NULLS FIRST, roundtrip NULLS FIRST,
        |  idna NULLS FIRST""".stripMargin,
    "q_fn_encrypt" ->
      """SELECT doc_id,
        |  substr(text, 1, 24) AS snippet,
        |  substr(text, 1, 24) AS roundtrip,
        |  -- PKCS#7: ciphertext = 16 * (floor(len/16) + 1) bytes; base64 of
        |  -- n bytes is 4 * ceil(n/3) chars
        |  CAST(4 * ceil((16 * (floor(length(substr(text, 1, 24)) / 16) + 1)) / 3.0) AS int)
        |    AS ct_b64_len
        |FROM documents
        |ORDER BY doc_id NULLS FIRST, snippet NULLS FIRST, roundtrip NULLS FIRST,
        |  ct_b64_len NULLS FIRST""".stripMargin
  )
}
