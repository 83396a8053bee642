package graft.queries

import graft.core.Tables
import graft.functions.{Codecs, IdGen, VectorKernels}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Function surface batch 5 (VERDICT round-1 "What's missing" #1/#2/#8):
  * multiSearch* / hasToken (reference src/Functions/multiSearchAny.cpp,
  * hasToken.cpp), ngramDistance/ngramSearch
  * (FunctionsStringSimilarity.cpp:559-567), toStartOfInterval +
  * parseDateTimeBestEffort (parseDateTimeBestEffort.cpp), UUID/snowflake
  * generation (generateUUIDv4.cpp, generateUUIDv7.cpp,
  * generateSnowflakeID.cpp), IPv6 codecs (FunctionsCodingIP.cpp), geohash
  * (geohashEncode.cpp).
  */
object Functions5 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  /** toStartOfInterval(ts, step in seconds) — epoch-aligned bucket
    * (reference toStartOfInterval.cpp). */
  private def toStartOfInterval(ts: Column, stepSeconds: Long): Column = {
    val us = unix_micros(ts)
    val step = lit(stepSeconds * 1000000L)
    timestamp_micros(us - pmod(us, step))
  }

  /** parseDateTimeBestEffort (reference parseDateTimeBestEffort.cpp):
    * try the common formats in a fixed order, first hit wins. */
  private def parseBestEffort(s: Column): Column = coalesce(
    try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss")),
    try_to_timestamp(s, lit("dd/MM/yyyy HH:mm:ss")),
    try_to_timestamp(s, lit("dd/MM/yyyy")),
    try_to_timestamp(s, lit("yyyy-MM-dd")))

  private val needles = Seq("data", "row", "key", "spark")

  val queries: Map[String, Q] = Map(
    // multiSearch family + hasToken over the documents corpus.
    "q_fn_multisearch" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val pos = array(needles.map(n => instr(col("text"), n)): _*)
      val posPositive = filter(pos, _ > 0)
      val firstPos = coalesce(array_min(posPositive), lit(0))
      ordered(d.select(
        col("doc_id"),
        needles.map(n => col("text").contains(n)).reduce(_ || _).as("ms_any"),
        firstPos.as("ms_first_pos"),
        when(firstPos === 0, 0)
          .otherwise(array_position(pos, firstPos).cast("int")).as("ms_first_idx"),
        upper(col("text")).contains("DATA").as("ms_any_ci"),
        col("text").rlike("(^|[^A-Za-z0-9])data([^A-Za-z0-9]|$)").as("has_tok"),
        col("text").rlike("(^|[^A-Za-z0-9])dat([^A-Za-z0-9]|$)").as("has_tok_partial")))
    },

    // ngramDistance / ngramSearch on overlapping slices of each document:
    // distinct char-4-gram sets reduced to sorted hashes ONCE per row
    // (CharNgramHashes kernel), similarity ratios computed from exact
    // integer counts so both engines see identical operands.
    "q_fn_ngram_sim" -> { (s, dir) =>
      val d = T(s, dir)("documents").filter(length(col("text")) >= 120)
      val a = substring(col("text"), 1, 60)
      val b = substring(col("text"), 31, 60)
      val ha = VectorKernels.char_ngram_hashes(a, 4)
      val hb = VectorKernels.char_ngram_hashes(b, 4)
      val inter = VectorKernels.intersect_count_sorted_longs(ha, hb)
      val na = size(ha).cast("long"); val nb = size(hb).cast("long")
      ordered(d.select(
        col("doc_id"),
        inter.as("n_shared"),
        na.as("n_a"), nb.as("n_b"),
        (lit(1.0) - (lit(2.0) * inter) / (na + nb)).as("ngram_dist"),
        (inter.cast("double") / nb).as("ngram_search")))
    },

    // toStartOfInterval 15-minute and 6-hour buckets + best-effort parse
    // of three text formats round-tripped from the same timestamp.
    "q_fn_interval_parse" -> { (s, dir) =>
      val e = T(s, dir)("events").filter(col("event_id") < 2000)
      ordered(e.select(
        col("event_id"),
        toStartOfInterval(col("ts"), 900L).as("b15m"),
        toStartOfInterval(col("ts"), 21600L).as("b6h"),
        parseBestEffort(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("p_iso"),
        parseBestEffort(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss")).as("p_isot"),
        parseBestEffort(date_format(col("ts"), "dd/MM/yyyy")).as("p_dmy"),
        parseBestEffort(lit("not a date")).as("p_bad")))
    },

    // UUID v4/v7 + snowflake: values are inherently random / time-based,
    // so the oracle checks the STRUCTURAL contract (format, version and
    // variant nibbles, embedded-time sanity) as booleans that must agree.
    "q_fn_uuid_ids" -> { (s, dir) =>
      val c = T(s, dir)("customer").filter(col("c_custkey") <= 200)
      val u4 = expr("uuid()")
      val u7 = IdGen.generate_uuid_v7()
      val sf = IdGen.generate_snowflake_id()
      val sfMs = IdGen.snowflake_to_millis(sf)
      // embedded times must land between 2020-01-01 and 2040-01-01
      val (loMs, hiMs) = (1577836800000L, 2208988800000L)
      val u7Ms = conv(concat(substring(u7, 1, 8), substring(u7, 10, 4)), 16, 10).cast("long")
      ordered(c.select(
        col("c_custkey"),
        (length(u4) === 36).as("u4_len"),
        u4.rlike("^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$").as("u4_v4"),
        u7.rlike("^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$").as("u7_v7"),
        (u7Ms >= loMs && u7Ms < hiMs).as("u7_time_sane"),
        (sf > 0L && sfMs >= loMs && sfMs < hiMs).as("sf_time_sane")))
    },

    // IPv6 codec roundtrips, oracle-checked: the five generated address
    // templates let the oracle regenerate hex layout + RFC 5952 canonical
    // per template in SQL (RFC vectors additionally pinned in CodecsSpec).
    "q_ipv6_codec" -> { (s, dir) =>
      val c = T(s, dir)("customer").filter(col("c_custkey") <= 500)
      val addr = when(pmod(col("c_custkey"), lit(5)) === 0, lit("::1"))
        .when(pmod(col("c_custkey"), lit(5)) === 1,
          format_string("2001:db8:%x::%x", col("c_custkey"), col("c_custkey") * 7))
        .when(pmod(col("c_custkey"), lit(5)) === 2,
          format_string("2001:0db8:0000:0000:0000:ff00:0042:%04x", col("c_custkey")))
        .when(pmod(col("c_custkey"), lit(5)) === 3,
          format_string("::ffff:10.0.%d.%d",
            pmod(col("c_custkey"), lit(256)), pmod(col("c_custkey") * 3, lit(256))))
        .otherwise(lit("not-an-ip"))
      val num = Codecs.ipv6_string_to_num(addr)
      ordered(c.select(
        col("c_custkey"), addr.as("addr"),
        hex(num).as("addr_hex"),
        Codecs.ipv6_num_to_string(num).as("canonical")))
    },

    // Geohash encode/decode roundtrip on deterministic synthetic coords,
    // oracle-checked via exact integer bit-interleaving in SQL (the 0.25
    // grid makes the bisection exact; public vectors also in CodecsSpec).
    "q_fn_geohash" -> { (s, dir) =>
      val c = T(s, dir)("customer").filter(col("c_custkey") <= 500)
      val lat = (pmod(col("c_custkey"), lit(180)) - 90.0 + 0.25).cast("double")
      val lon = (pmod(col("c_custkey") * 7, lit(360)) - 180.0 + 0.25).cast("double")
      val gh = Codecs.geohash_encode(lon, lat, 8)
      val dec = Codecs.geohash_decode(gh)
      ordered(c.select(
        col("c_custkey"), gh.as("gh8"),
        // cell at precision 8: ~0.000343° lon, ~0.000172° lat — decode
        // must land inside half a cell of the input.
        (abs(element_at(dec, 1) - lon) < 0.0002).as("lon_ok"),
        (abs(element_at(dec, 2) - lat) < 0.0001).as("lat_ok")))
    },

    // Geo cell indexing (h3kRing/geohashesInBox analog family, reference
    // src/Functions/h3kRing.cpp + geohashesInBox.cpp): per-point cell at
    // precision 4, its 3x3 kRing (rendered as a ','-joined string — the
    // driver comparator takes scalars only), and the size of the
    // precision-3 cell cover of a 2°x2° box around the point.
    // Oracle-checked via exact integer cell-index arithmetic in SQL
    // (see the oracle entry); kernels also unit-pinned in CodecsSpec.
    "q_geo_cells" -> { (s, dir) =>
      import graft.functions.GeoCells
      val c = T(s, dir)("customer").filter(col("c_custkey") <= 300)
      val lat = (pmod(col("c_custkey"), lit(160)) - 80.0 + 0.25).cast("double")
      val lon = (pmod(col("c_custkey") * 7, lit(360)) - 180.0 + 0.25).cast("double")
      val cell = Codecs.geohash_encode(lon, lat, 4)
      ordered(c.select(
        col("c_custkey"), cell.as("cell"),
        array_join(GeoCells.geohash_kring(cell, 1), ",").as("ring"),
        size(GeoCells.geohashes_in_box(lon - 1.0, lat - 1.0, lon + 1.0, lat + 1.0, 3))
          .as("n_box_cells")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // The five address templates are enumerable from c_custkey, so the
    // oracle regenerates parse + RFC 5952 canonical form per template from
    // first principles (printf), independent of the Scala codec.
    "q_ipv6_codec" ->
      """SELECT c_custkey,
        |  CASE c_custkey % 5
        |    WHEN 0 THEN '::1'
        |    WHEN 1 THEN printf('2001:db8:%x::%x', c_custkey, c_custkey*7)
        |    WHEN 2 THEN printf('2001:0db8:0000:0000:0000:ff00:0042:%04x', c_custkey)
        |    WHEN 3 THEN printf('::ffff:10.0.%d.%d', c_custkey % 256, (c_custkey*3) % 256)
        |    ELSE 'not-an-ip' END AS addr,
        |  CASE c_custkey % 5
        |    WHEN 0 THEN '00000000000000000000000000000001'
        |    WHEN 1 THEN upper(printf('20010db8%04x0000000000000000%04x', c_custkey, c_custkey*7))
        |    WHEN 2 THEN upper(printf('20010db8000000000000ff000042%04x', c_custkey))
        |    WHEN 3 THEN upper(printf('00000000000000000000ffff0a00%02x%02x', c_custkey % 256, (c_custkey*3)%256))
        |    ELSE NULL END AS addr_hex,
        |  CASE c_custkey % 5
        |    WHEN 0 THEN '::1'
        |    WHEN 1 THEN printf('2001:db8:%x::%x', c_custkey, c_custkey*7)
        |    WHEN 2 THEN printf('2001:db8::ff00:42:%x', c_custkey)
        |    WHEN 3 THEN printf('::ffff:10.0.%d.%d', c_custkey % 256, (c_custkey*3)%256)
        |    ELSE NULL END AS canonical
        |FROM customer WHERE c_custkey <= 500
        |ORDER BY c_custkey NULLS FIRST, addr NULLS FIRST, addr_hex NULLS FIRST, canonical NULLS FIRST""".stripMargin,
    // The 0.25-offset grid makes 4*(lon+180) and 4*(lat+90) exact
    // integers, so the bisection encode reduces to exact integer
    // floor-scaling: lonb = floor(n*2^20/1440) — the oracle interleaves
    // those bits and base32-encodes with no floating point at all.
    "q_fn_geohash" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |    4*((c_custkey*7) % 360) + 1 AS nlon,
        |    4*(c_custkey % 180) + 1 AS nlat
        |  FROM customer WHERE c_custkey <= 500),
        |b AS (
        |  SELECT c_custkey,
        |    (nlon * 1048576) // 1440 AS lonb,
        |    (nlat * 1048576) // 720 AS latb
        |  FROM pts),
        |inter AS (
        |  SELECT c_custkey, lonb, latb,
        |    list_sum(list_transform(range(20), j ->
        |      (((lonb >> (19-j)) & 1) << (39-2*j)) + (((latb >> (19-j)) & 1) << (38-2*j)))) AS bit40
        |  FROM b)
        |SELECT c_custkey,
        |  list_aggregate(list_transform(range(8), k ->
        |    substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((bit40 >> (35-5*k)) & 31) AS INT) + 1, 1)), 'string_agg', '') AS gh8,
        |  abs((-180.0 + (2*lonb+1) * 360.0 / 2097152.0) - ((c_custkey*7) % 360 - 180 + 0.25)) < 0.0002 AS lon_ok,
        |  abs((-90.0 + (2*latb+1) * 180.0 / 2097152.0) - (c_custkey % 180 - 90 + 0.25)) < 0.0001 AS lat_ok
        |FROM inter
        |ORDER BY c_custkey NULLS FIRST, gh8 NULLS FIRST, lon_ok NULLS FIRST, lat_ok NULLS FIRST""".stripMargin,
    // Exact integer re-derivation of the whole cell family: cell ids via
    // bit-interleaving (the 0.25 grid makes the bisection exact, as in
    // q_fn_geohash), the 3x3 kRing via (lonb±1 mod 2^10, latb±1 clamped)
    // in index space with row-major keep-first dedup, and the box-cover
    // size as a closed-form floor-count of intersecting cell centers
    // (capped at the lon<180 / lat<=90 iteration bounds).
    "q_geo_cells" ->
      """WITH pts AS (
        |  SELECT c_custkey, (c_custkey*7) % 360 AS lonm, c_custkey % 160 AS latm
        |  FROM customer WHERE c_custkey <= 300),
        |cells AS (
        |  SELECT c_custkey, lonm, latm,
        |    ((4*lonm + 1) * 1024) // 1440 AS lonb,
        |    ((4*latm + 41) * 1024) // 720 AS latb
        |  FROM pts),
        |offs AS (
        |  SELECT (dy+1)*3 + (dx+1) AS ord, dx, dy
        |  FROM (SELECT unnest([-1,0,1]) AS dy), (SELECT unnest([-1,0,1]) AS dx)),
        |ring_cells AS (
        |  SELECT c.c_custkey, d.ord,
        |    (c.lonb + d.dx + 1024) % 1024 AS nlonb,
        |    greatest(0, least(1023, c.latb + d.dy)) AS nlatb
        |  FROM cells c, offs d),
        |ring_enc AS (
        |  SELECT c_custkey, ord,
        |    list_sum(list_transform(range(10), j ->
        |      (((nlonb >> (9-j)) & 1) << (19-2*j)) + (((nlatb >> (9-j)) & 1) << (18-2*j)))) AS bit20
        |  FROM ring_cells),
        |ring_str AS (
        |  SELECT c_custkey, ord,
        |    list_aggregate(list_transform(range(4), kk ->
        |      substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((bit20 >> (15-5*kk)) & 31) AS INT) + 1, 1)), 'string_agg', '') AS cell
        |  FROM ring_enc),
        |ring_dedup AS (
        |  SELECT c_custkey, cell, min(ord) AS o FROM ring_str GROUP BY c_custkey, cell),
        |ring_join AS (
        |  SELECT c_custkey, string_agg(cell, ',' ORDER BY o) AS ring FROM ring_dedup GROUP BY c_custkey),
        |boxn AS (
        |  SELECT c_custkey,
        |    (least((((4*lonm + 5)*8 + 45000)//45) - 1000, 255)
        |      - ((((4*lonm - 3)*8 + 45000)//45) - 1000) + 1) AS nlon,
        |    (least((((4*latm + 45)*8 + 45000)//45) - 1000, 127)
        |      - ((((4*latm + 37)*8 + 45000)//45) - 1000) + 1) AS nlat
        |  FROM pts)
        |SELECT p.c_custkey, m.cell, r.ring, CAST(b.nlon * b.nlat AS INT) AS n_box_cells
        |FROM pts p
        |JOIN (SELECT c_custkey, cell FROM ring_str WHERE ord = 4) m USING (c_custkey)
        |JOIN ring_join r USING (c_custkey)
        |JOIN boxn b USING (c_custkey)
        |ORDER BY p.c_custkey NULLS FIRST, cell NULLS FIRST, ring NULLS FIRST, n_box_cells NULLS FIRST""".stripMargin,
    "q_fn_multisearch" ->
      """WITH p AS (SELECT doc_id, text,
        |    [instr(text,'data'), instr(text,'row'), instr(text,'key'), instr(text,'spark')] AS pos
        |  FROM documents),
        |q AS (SELECT doc_id, text, pos,
        |    coalesce(list_min(list_filter(pos, x -> x > 0)), 0) AS fp FROM p)
        |SELECT doc_id,
        |  (contains(text,'data') OR contains(text,'row') OR contains(text,'key')
        |    OR contains(text,'spark')) AS ms_any,
        |  cast(fp AS int) AS ms_first_pos,
        |  cast(CASE WHEN fp = 0 THEN 0 ELSE list_position(pos, fp) END AS int) AS ms_first_idx,
        |  contains(upper(text), 'DATA') AS ms_any_ci,
        |  regexp_matches(text, '(^|[^A-Za-z0-9])data([^A-Za-z0-9]|$)') AS has_tok,
        |  regexp_matches(text, '(^|[^A-Za-z0-9])dat([^A-Za-z0-9]|$)') AS has_tok_partial
        |FROM q
        |ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q_fn_ngram_sim" ->
      """WITH s AS (SELECT doc_id,
        |    substring(text, 1, 60) AS a, substring(text, 31, 60) AS b
        |  FROM documents WHERE length(text) >= 120),
        |g AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, length(a) - 2), i -> a[i:i+3])) AS ga,
        |    list_distinct(list_transform(range(1, length(b) - 2), i -> b[i:i+3])) AS gb
        |  FROM s),
        |m AS (SELECT doc_id,
        |    cast(len(list_filter(ga, x -> list_contains(gb, x))) AS bigint) AS n_shared,
        |    cast(len(ga) AS bigint) AS n_a, cast(len(gb) AS bigint) AS n_b
        |  FROM g)
        |SELECT doc_id, n_shared, n_a, n_b,
        |  1.0 - (2.0 * n_shared) / (n_a + n_b) AS ngram_dist,
        |  cast(n_shared AS double) / n_b AS ngram_search
        |FROM m
        |ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q_fn_interval_parse" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_id < 2000)
        |SELECT event_id,
        |  make_timestamp(epoch_us(ts) - epoch_us(ts) % 900000000) AS b15m,
        |  make_timestamp(epoch_us(ts) - epoch_us(ts) % 21600000000) AS b6h,
        |  coalesce(try_strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')) AS p_iso,
        |  coalesce(try_strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S')) AS p_isot,
        |  coalesce(try_strptime(strftime(ts, '%d/%m/%Y'), '%d/%m/%Y')) AS p_dmy,
        |  try_strptime('not a date', '%Y-%m-%d') AS p_bad
        |FROM e
        |ORDER BY event_id NULLS FIRST""".stripMargin,
    "q_fn_uuid_ids" ->
      """SELECT c_custkey,
        |  true AS u4_len, true AS u4_v4, true AS u7_v7,
        |  true AS u7_time_sane, true AS sf_time_sane
        |FROM customer WHERE c_custkey <= 200
        |ORDER BY c_custkey NULLS FIRST""".stripMargin
  )
}
