package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface, batch 2 (SURVEY.md §2.8): more array ops,
  * split_part, datetime parse/format round-trips, URL parsing, structs
  * (tuples), INTERSECT/EXCEPT ALL, GROUPING SETS with grouping(),
  * discrete percentiles, map construction+lookup, EMA fold.
  */
object Functions2 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // More array functions (reference src/Functions/array/).
    "q_fn_array_more" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val toks = split(col("text"), " ")
      ordered(d.select(
        col("doc_id"),
        array_position(toks, "data").as("pos_data"),
        arrays_overlap(toks, array(lit("spark"), lit("row"))).as("overlap_kw"),
        array_max(transform(toks, t => length(t))).as("max_tok_len"),
        array_min(transform(toks, t => length(t))).as("min_tok_len"),
        size(array_remove(toks, "the")).as("n_no_the"),
        array_join(array_repeat(lit("ab"), 3), "").as("rep3"),
        size(flatten(array(toks, toks))).as("n_doubled")))
    },

    // split_part (reference splitByChar + arrayElement).
    "q_fn_split_part" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      ordered(d.select(
        col("doc_id"),
        split_part(col("text"), lit(" "), lit(2)).as("tok2"),
        split_part(col("text"), lit(" "), lit(-1)).as("tok_last"),
        split_part(col("source"), lit("rc"), lit(2)).as("src_tail")))
    },

    // Datetime format/parse round-trip + constructors + epoch conversions
    // (reference formatDateTime/parseDateTime/makeDate/toUnixTimestamp).
    "q_fn_datetime_parse" -> { (s, dir) =>
      val o = T(s, dir)("orders").filter(col("o_orderkey") < 500)
      val ts = col("o_orderdate").cast("timestamp")
      ordered(o.select(
        col("o_orderkey"),
        date_format(ts, "yyyy-MM-dd HH:mm:ss").as("fmt"),
        to_timestamp(date_format(ts, "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss").as("reparsed"),
        make_timestamp(year(ts), month(ts), dayofmonth(ts), lit(12), lit(30), lit(0)).as("made"),
        unix_micros(ts).as("us"),
        timestamp_micros(unix_micros(ts)).as("rt")))
    },

    // URL functions (reference src/Functions/URL/) — parse_url vs an
    // independent regexp decomposition in the oracle.
    "q_fn_url" -> { (s, dir) =>
      val d = T(s, dir)("documents")
      val url = concat(lit("https://data.example.com/corpus/"), col("source"),
        lit("/doc?id="), col("doc_id").cast("string"), lit("&lang="), col("lang"))
      ordered(d.select(
        col("doc_id"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("lang")).as("lang_param")))
    },

    // Tuples/structs (reference tuple.cpp/tupleElement.cpp).
    "q_fn_struct" -> { (s, dir) =>
      val c = T(s, dir)("customer").filter(col("c_custkey") < 300)
      val st = struct(col("c_custkey"), col("c_mktsegment"))
      // struct serialized as canonical JSON text so the comparison is a
      // plain string on both engines
      ordered(c.select(
        col("c_custkey"),
        to_json(st).as("tup"),
        st.getField("c_mktsegment").as("seg_from_tup")))
    },

    // INTERSECT ALL / EXCEPT ALL (multiset semantics).
    "q_set_intersect_all" -> { (s, dir) =>
      val c = T(s, dir)("customer").select(col("c_nationkey").as("nk"))
      val sup = T(s, dir)("supplier").select(col("s_nationkey").as("nk"))
      ordered(c.intersectAll(sup).groupBy(col("nk")).agg(count(lit(1)).as("n")))
    },
    "q_set_except_all" -> { (s, dir) =>
      val c = T(s, dir)("customer").select(col("c_nationkey").as("nk"))
      val sup = T(s, dir)("supplier").select(col("s_nationkey").as("nk"))
      ordered(c.exceptAll(sup).groupBy(col("nk")).agg(count(lit(1)).as("n")))
    },

    // GROUPING SETS with grouping() markers (reference AggregatingStep
    // grouping sets + src/Functions/grouping.h).
    "q_grouping_sets" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ordered(s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  cast(grouping(o_orderstatus) AS int) AS g_status,
          |  cast(grouping(o_orderpriority) AS int) AS g_prio,
          |  sum(o_totalprice) AS sum_price, count(*) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |""".stripMargin))
    },

    // percentile_disc / median (reference quantileExact discrete modes).
    "q_quantile_disc" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      Tables.registerAll(s, dir)
      ordered(s.sql(
        """SELECT l_returnflag,
          |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_disc,
          |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_disc,
          |  median(l_quantity) AS med
          |FROM lineitem GROUP BY l_returnflag""".stripMargin))
    },

    // Map construction + lookup (reference map.cpp / dictGet-style lookup;
    // broadcast-map semantics, scalar output for cross-engine stability).
    "q_fn_map_lookup" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val weights = map(
        lit("click"), lit(1.0), lit("view"), lit(0.5),
        lit("purchase"), lit(5.0), lit("signup"), lit(2.0))
      ordered(e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          coalesce(element_at(weights, col("event_type")), lit(0.0)).as("weight")))
    },

    // Exponential moving average per user via ordered fold (reference
    // exponentialMovingAverage) — same fold order as DuckDB list_reduce.
    "q_fn_ema" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val vals = transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
        x => x.getField("value"))
      ordered(e.groupBy(col("user_id"))
        .agg(vals.as("vs"))
        .select(col("user_id"),
          when(size(col("vs")) === 1, element_at(col("vs"), 1))
            .otherwise(aggregate(
              slice(col("vs"), lit(2), size(col("vs")) - 1),
              element_at(col("vs"), 1),
              (acc, x) => acc * 0.9 + x * 0.1)).as("ema")))
    },

    // mapApply / mapUpdate / mapPopulateSeries (reference
    // src/Functions/map.cpp): per-user day-of-month count map, counts
    // doubled (mapApply), day 1 overridden to 0 (mapUpdate), gaps in
    // min(key)..max(key) filled with 0 (mapPopulateSeries); exploded to
    // scalar rows for the comparator.
    "q_fn_map_apply" -> { (s, dir) =>
      import graft.ops.MapOps
      val e = T(s, dir)("events").filter(col("user_id") < 30)
        .groupBy(col("user_id"), dayofmonth(col("ts")).as("k"))
        .agg(count(lit(1)).as("cnt"))
      val m0 = e.groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("k"), col("cnt")))).as("m"))
      val m3 = m0.select(col("user_id"),
        MapOps.mapPopulateSeries(
          MapOps.mapUpdate(
            MapOps.mapApply(col("m"), (k, v) => (k, v * 2)),
            map(lit(1), lit(0L)))).as("m"))
      ordered(m3.select(col("user_id"), explode(col("m")).as(Seq("k", "v"))))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_fn_array_more" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  cast(list_position(toks, 'data') AS bigint) AS pos_data,
        |  len(list_intersect(toks, ['spark','row'])) > 0 AS overlap_kw,
        |  cast(list_aggregate(list_transform(toks, t -> length(t)), 'max') AS int) AS max_tok_len,
        |  cast(list_aggregate(list_transform(toks, t -> length(t)), 'min') AS int) AS min_tok_len,
        |  cast(len(list_filter(toks, t -> t <> 'the')) AS int) AS n_no_the,
        |  repeat('ab', 3) AS rep3,
        |  cast(2 * len(toks) AS int) AS n_doubled
        |FROM t ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q_fn_split_part" ->
      """SELECT doc_id,
        |  split_part(text, ' ', 2) AS tok2,
        |  list_extract(string_split(text, ' '), -1) AS tok_last,
        |  split_part(source, 'rc', 2) AS src_tail
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q_fn_datetime_parse" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt,
        |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS reparsed,
        |  make_timestamp(year(o_orderdate), month(o_orderdate), day(o_orderdate), 12, 30, 0.0) AS made,
        |  epoch_us(o_orderdate) AS us,
        |  make_timestamp(epoch_us(o_orderdate)) AS rt
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,
    "q_fn_url" ->
      """WITH u AS (SELECT doc_id,
        |  'https://data.example.com/corpus/' || source || '/doc?id=' || doc_id || '&lang=' || lang AS url
        |FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, 'https?://([^/]+)', 1) AS host,
        |  regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param
        |FROM u ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q_fn_struct" ->
      """SELECT c_custkey,
        |  '{"c_custkey":' || c_custkey || ',"c_mktsegment":"' || c_mktsegment || '"}' AS tup,
        |  c_mktsegment AS seg_from_tup
        |FROM customer WHERE c_custkey < 300
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,
    "q_set_intersect_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT ALL SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_set_except_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT ALL SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  cast(grouping(o_orderstatus) AS int) AS g_status,
        |  cast(grouping(o_orderpriority) AS int) AS g_prio,
        |  sum(o_totalprice) AS sum_price, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, g_status NULLS FIRST, g_prio NULLS FIRST, sum_price NULLS FIRST, n NULLS FIRST""".stripMargin,
    "q_quantile_disc" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.5) AS med_disc,
        |  quantile_disc(l_quantity, 0.9) AS p90_disc,
        |  median(l_quantity) AS med
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q_fn_map_lookup" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(CASE event_type WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5
        |    WHEN 'purchase' THEN 5.0 WHEN 'signup' THEN 2.0 ELSE 0.0 END AS DOUBLE) AS weight
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST, n NULLS FIRST, weight NULLS FIRST""".stripMargin,
    "q_fn_ema" ->
      """SELECT user_id,
        |  list_reduce(list(value ORDER BY ts, event_id),
        |    (acc, x) -> acc * 0.9 + x * 0.1) AS ema
        |FROM events GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, ema NULLS FIRST""".stripMargin,
    "q_fn_map_apply" ->
      """WITH c AS (SELECT user_id, day(CAST(ts AS TIMESTAMP)) AS k, count(*) AS cnt
        |    FROM events WHERE user_id < 30 GROUP BY 1, 2),
        |b AS (SELECT user_id, least(min(k), 1) AS mn, greatest(max(k), 1) AS mx
        |    FROM c GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(mn, mx + 1)) AS k FROM b),
        |j AS (SELECT g.user_id, g.k,
        |    CASE WHEN g.k = 1 THEN 0 ELSE coalesce(2 * c.cnt, 0) END AS v
        |  FROM grid g LEFT JOIN c ON c.user_id = g.user_id AND c.k = g.k)
        |SELECT user_id, CAST(k AS INT) AS k, CAST(v AS BIGINT) AS v FROM j
        |ORDER BY user_id NULLS FIRST, k NULLS FIRST, v NULLS FIRST""".stripMargin
  )
}
