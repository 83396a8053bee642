package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Function surface batch 3 (SURVEY.md §2.4 misc + §2.8): sumMap,
  * interval arithmetic, exponentialTimeDecayedSum, IPv4 codecs,
  * formatReadableSize.
  */
object Functions3 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  val queries: Map[String, Q] = Map(
    // sumMap (reference sumMap/minMap/maxMap): per returnflag, linestatus
    // -> total qty map, emitted as canonical sorted entries text.
    "q_sum_map" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val inner = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("q"))
      ordered(inner.groupBy(col("l_returnflag"))
        .agg(concat_ws(",", sort_array(collect_list(
          concat(col("l_linestatus"), lit(":"), col("q").cast("string"))))).as("qty_map")))
    },

    // Interval arithmetic (reference addMonths/addDays/subtract*).
    "q_interval_arith" -> { (s, dir) =>
      val o = T(s, dir)("orders").filter(col("o_orderkey") < 500)
      val ts = col("o_orderdate")
      ordered(o.select(
        col("o_orderkey"),
        add_months(ts, 3).as("plus3mo"),
        add_months(ts, -14).as("minus14mo"),
        date_add(ts, 45).as("plus45d"),
        date_sub(ts, 45).as("minus45d"),
        (months_between(lit("2002-01-01").cast("timestamp"), date_trunc("month", ts))).cast("int").as("mo_to_2002")))
    },

    // exponentialTimeDecayedSum (reference WindowTransform.cpp:1617) —
    // decayed sum anchored at each user's last event (order-independent
    // formulation, exact in SQL): sum(v * exp(-(t_last - t)/tau)).
    "q_exp_decay_sum" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val tau = 86400.0 // 1-day decay constant
      val withLast = e.withColumn("t_last",
        max(unix_micros(col("ts"))).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      ordered(withLast.groupBy(col("user_id"))
        .agg(sum(col("value") *
          exp((col("t_last") - unix_micros(col("ts"))) / lit(-1e6 * tau))).as("decayed_sum")))
    },

    // IPv4 codecs (reference FunctionsCodingIP.cpp) from pure arithmetic:
    // derived u32 -> dotted string -> back.
    "q_ipv4_codec" -> { (s, dir) =>
      val o = T(s, dir)("orders").filter(col("o_orderkey") < 1000)
      val ip = pmod(col("o_orderkey") * 2654435761L, lit(4294967296L))
      val dotted = concat_ws(".",
        shiftright(ip, 24).bitwiseAND(255).cast("string"),
        shiftright(ip, 16).bitwiseAND(255).cast("string"),
        shiftright(ip, 8).bitwiseAND(255).cast("string"),
        ip.bitwiseAND(255).cast("string"))
      val parts = split(dotted, "\\.")
      val back = element_at(parts, 1).cast("long") * 16777216L +
        element_at(parts, 2).cast("long") * 65536L +
        element_at(parts, 3).cast("long") * 256L +
        element_at(parts, 4).cast("long")
      ordered(o.select(col("o_orderkey"), ip.as("ip_num"), dotted.as("ip_str"),
        back.as("roundtrip"), (ip === back).as("ok")))
    },

    // formatReadableSize (reference formatReadableSize.cpp): value+unit,
    // numeric part as rounded double (no printf formatting — rounding
    // mode differences between engines stay out of the comparison).
    "q_format_readable" -> { (s, dir) =>
      val o = T(s, dir)("orders").filter(col("o_orderkey") < 1000)
      val bytes = (col("o_totalprice") * 1000).cast("long")
      val unitIdx = floor(log(bytes.cast("double")) / log(lit(1024.0))).cast("int")
      val unit = element_at(array(lit("B"), lit("KiB"), lit("MiB"), lit("GiB"), lit("TiB")),
        unitIdx + 1)
      val value = round(bytes.cast("double") / pow(lit(1024.0), unitIdx), 2)
      ordered(o.select(col("o_orderkey"), bytes.as("nbytes"),
        value.as("size_val"), unit.as("size_unit")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_sum_map" ->
      """WITH im AS (SELECT l_returnflag, l_linestatus,
        |    cast(sum(l_quantity) AS bigint) AS q
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  string_agg(l_linestatus || ':' || q, ',' ORDER BY l_linestatus || ':' || q) AS qty_map
        |FROM im GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q_interval_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
        |  CAST(o_orderdate - INTERVAL 14 MONTH AS DATE) AS minus14mo,
        |  CAST(o_orderdate AS DATE) + 45 AS plus45d,
        |  CAST(o_orderdate AS DATE) - 45 AS minus45d,
        |  cast(date_diff('month', date_trunc('month', o_orderdate), TIMESTAMP '2002-01-01') AS int) AS mo_to_2002
        |FROM orders WHERE o_orderkey < 1000 AND o_orderkey < 500
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,
    "q_exp_decay_sum" ->
      """WITH e AS (SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |m AS (SELECT user_id, max(us) AS t_last FROM e GROUP BY user_id)
        |SELECT e.user_id AS user_id,
        |  sum(e.value * exp((m.t_last - e.us) / (-1e6 * 86400.0))) AS decayed_sum
        |FROM e JOIN m USING (user_id)
        |GROUP BY e.user_id
        |ORDER BY user_id NULLS FIRST, decayed_sum NULLS FIRST""".stripMargin,
    "q_ipv4_codec" ->
      """WITH t AS (SELECT o_orderkey,
        |    (o_orderkey * 2654435761) % 4294967296 AS ip
        |  FROM orders WHERE o_orderkey < 1000),
        |d AS (SELECT o_orderkey, ip,
        |    ((ip >> 24) & 255) || '.' || ((ip >> 16) & 255) || '.' ||
        |    ((ip >> 8) & 255) || '.' || (ip & 255) AS ip_str
        |  FROM t)
        |SELECT o_orderkey, ip AS ip_num, ip_str,
        |  cast(split_part(ip_str, '.', 1) AS bigint) * 16777216
        |    + cast(split_part(ip_str, '.', 2) AS bigint) * 65536
        |    + cast(split_part(ip_str, '.', 3) AS bigint) * 256
        |    + cast(split_part(ip_str, '.', 4) AS bigint) AS roundtrip,
        |  true AS ok
        |FROM d
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,
    "q_format_readable" ->
      """WITH t AS (SELECT o_orderkey,
        |    cast(floor(o_totalprice * 1000) AS bigint) AS nbytes
        |  FROM orders WHERE o_orderkey < 1000),
        |u AS (SELECT *, cast(floor(ln(nbytes::DOUBLE) / ln(1024.0)) AS int) AS ui FROM t)
        |SELECT o_orderkey, nbytes,
        |  round(nbytes::DOUBLE / pow(1024.0, ui), 2) AS size_val,
        |  ['B','KiB','MiB','GiB','TiB'][ui + 1] AS size_unit
        |FROM u
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin
  )
}
