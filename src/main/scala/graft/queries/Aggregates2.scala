package graft.queries

import graft.core.Tables
import graft.ops.Ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregate tail, round 2 (VERDICT "What's missing" #3): covarMatrix,
  * kolmogorovSmirnovTest, cramersV/theilsU, sequenceNextNode, uniqTheta,
  * sparkbar, largestTriangleThreeBuckets (reference:
  * src/AggregateFunctions/registerAggregateFunctions.cpp:55,79-91,
  * AggregateFunctionSequenceNextNode.cpp, AggregateFunctionUniq.h,
  * AggregateFunctionSparkbar.cpp,
  * AggregateFunctionLargestTriangleThreeBuckets.cpp).
  */
object Aggregates2 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  private val blocks = "▁▂▃▄▅▆▇█"

  val queries: Map[String, Q] = Map(
    // covarMatrix: pairwise sample covariances of three measures in one
    // aggregation pass, exploded to (x, y, cov) rows.
    "q_covar_matrix" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val cols0 = Seq("l_quantity", "l_extendedprice", "l_discount")
      val cells = for (a <- cols0; b <- cols0) yield
        covar_samp(col(a), col(b)).as(s"c_${a}_$b")
      val wide = li.agg(cells.head, cells.tail: _*)
      val rows = cols0.flatMap(a => cols0.map(b =>
        struct(lit(a).as("x"), lit(b).as("y"),
          round(col(s"c_${a}_$b"), 6).as("cov"))))
      ordered(wide.select(explode(array(rows: _*)).as("cell"))
        .select(col("cell.x"), col("cell.y"), col("cell.cov")))
    },

    // Two-sample Kolmogorov-Smirnov D statistic between the A and R
    // return-flag quantity distributions. ECDFs via the scale-safe
    // running total (x is distinct after the groupBy); D = max |Fa - Fr|
    // is fold-order-free (max of deterministic doubles).
    "q_ks_test" -> { (s, dir) =>
      val li = T(s, dir)("lineitem").filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("g"), col("l_quantity").as("x"))
      val byVal = li.groupBy(col("x")).agg(
        sum(when(col("g") === "A", 1).otherwise(0)).as("ca"),
        sum(when(col("g") === "R", 1).otherwise(0)).as("cr"))
      val cum = Ops.runningTotalExclusive(
        Ops.runningTotalExclusive(byVal, col("x"), col("ca"), "exa"),
        col("x"), col("cr"), "exr")
        .select((col("exa") + col("ca")).as("cuma"), (col("exr") + col("cr")).as("cumr"))
      val tot = byVal.agg(sum(col("ca")).as("na"), sum(col("cr")).as("nr"))
      cum.crossJoin(broadcast(tot))
        .agg(max(abs(col("cuma") / col("na") - col("cumr") / col("nr"))).as("d_stat"),
          max(col("na")).as("n_a"), max(col("nr")).as("n_r"))
    },

    // cramersV + theilsU over the (returnflag, linestatus) contingency
    // table. Exact integer cell counts; the few-cell double folds round
    // to 9 decimals on both sides.
    "q_cramers_theils" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val cells = li.groupBy(col("l_returnflag").as("a"), col("l_linestatus").as("b"))
        .agg(count(lit(1)).as("nij"))
      val ra = cells.groupBy(col("a")).agg(sum(col("nij")).as("ra"))
      val cb = cells.groupBy(col("b")).agg(sum(col("nij")).as("cb"))
      val tot = cells.agg(sum(col("nij")).as("n"), countDistinct(col("a")).as("r"))
      val nb = cells.agg(countDistinct(col("b")).as("c"))
      val joined = cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
        .crossJoin(broadcast(tot)).crossJoin(broadcast(nb))
      val e = col("ra") * col("cb") / col("n")
      val chi2 = sum(pow(col("nij") - e, 2) / e)
      val hu = sum(-(col("nij") / col("n")) * log(col("nij") / col("cb")))
      val haDf = ra.crossJoin(broadcast(tot))
        .agg(sum(-(col("ra") / col("n")) * log(col("ra") / col("n"))).as("ha"))
      joined
        .agg(chi2.as("chi2"), hu.as("hu"),
          max(col("n")).as("nn"), max(col("r")).as("rr"), max(col("c")).as("cc"))
        .crossJoin(broadcast(haDf))
        .select(
          round(sqrt(col("chi2") / col("nn") /
            least(col("rr") - 1, col("cc") - 1)), 9).as("cramers_v"),
          round((col("ha") - col("hu")) / col("ha"), 9).as("theils_u"))
    },

    // sequenceNextNode(forward, head): per user, the event type that
    // follows the first 'view' -> 'click' chain (events ordered by
    // ts, event_id).
    "q_sequence_next_node" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withLead = e
        .withColumn("e1", lead(col("event_type"), 1).over(w))
        .withColumn("e2", lead(col("event_type"), 2).over(w))
      val matches = withLead
        .filter(col("event_type") === "view" && col("e1") === "click")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .filter(col("rn") === 1)
      ordered(matches.select(col("user_id"), col("e2").as("next_node")))
    },

    // uniqTheta (KMV sketch): deterministic approximate distinct with an
    // oracle-pinned accuracy contract (same pattern as q_uniq_approx).
    "q_uniq_theta" -> { (s, dir) =>
      val kmv = udaf(new graft.aggregates.KmvDistinctAggregator(1024))
      val li = T(s, dir)("lineitem")
      ordered(li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_nd"),
          kmv(col("l_partkey")).as("theta_nd"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("theta_nd") - col("exact_nd")).cast("double") /
            col("exact_nd") <= 0.1).as("theta_within_10pct")))
    },

    // sparkbar: unicode mini-histogram of per-user-bucket event counts,
    // one bar per event type. Levels via exact integer ceil-division so
    // both engines pick identical block characters.
    "q_sparkbar" -> { (s, dir) =>
      val e = T(s, dir)("events")
      val counts = e.groupBy(col("event_type"), pmod(col("user_id"), lit(10)).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val mx = counts.groupBy(col("event_type")).agg(max(col("cnt")).as("mx"))
      val lev = counts.join(broadcast(mx), "event_type")
        .withColumn("level", expr("CAST((cnt * 8 + mx - 1) DIV mx AS INT)"))
      ordered(lev.groupBy(col("event_type"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("bucket"), col("level")))),
          p => lit(blocks).substr(p.getField("level"), lit(1))), "").as("bar")))
    },

    // sumForEach combinator: elementwise sums of the 64-dim embeddings
    // per vec_id%5 group (reference AggregateFunctionForEach.cpp).
    // Rounded to 6 decimals on both sides (distributed vs sequential
    // float fold order).
    "q_sum_foreach" -> { (s, dir) =>
      val e = T(s, dir)("embeddings")
        .select(pmod(col("vec_id"), lit(5)).as("g"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val summed = graft.ops.Combinators.sumForEach(e, Seq(col("g")), col("v"), "sums")
      // Exploded to scalar rows (the driver's comparator can't sort ARRAY
      // columns); 1-based idx matches DuckDB list indexing. Scaled-long
      // emission (floor(v*1e6+0.5)) is bit-exact across engines where
      // round() is not.
      ordered(summed.select(col("g"), posexplode(col("sums")).as(Seq("i0", "s")))
        .select(col("g"), (col("i0") + 1).as("i"),
          floor(col("s") * 1e6 + 0.5).as("s6")))
    },

    // sumResample combinator: per return flag, revenue resampled into 5
    // quantity buckets [1,51) step 10 (reference
    // AggregateFunctionResample.cpp); empty buckets 0, rounded to 4.
    "q_sum_resample" -> { (s, dir) =>
      val li = T(s, dir)("lineitem")
      val res = graft.ops.Combinators.sumResample(li,
        Seq(col("l_returnflag").as("g")), col("l_extendedprice"), col("l_quantity"),
        start = 1L, end = 51L, step = 10L, out = "sums")
      // Exploded to (g, bucket, whole-unit sum) scalar rows for the driver's
      // comparator; floor(s+0.5) keeps the value integral and bit-exact.
      ordered(res.select(col("g"), posexplode(col("sums")).as(Seq("bk", "s")))
        .select(col("g"), col("bk"), floor(col("s") + 0.5).as("s0")))
    },

    // largestTriangleThreeBuckets: downsample each event type's
    // (ts, value) series to 9 shape-preserving points. Oracle-checked
    // (round 10): the sequential selection is re-derived in DuckDB as a
    // recursive CTE; algorithm vectors also pinned in AggregatesSpec.
    "q_lttb" -> { (s, dir) =>
      import s.implicits._
      val lttb = udaf(new graft.aggregates.LttbAggregator(9))
      val e = T(s, dir)("events")
      ordered(e.select(col("event_type"),
          unix_micros(col("ts")).cast("double").as("x"), col("value").as("y"))
        .groupBy(col("event_type"))
        .agg(lttb(col("x"), col("y")).as("pts"))
        .select(col("event_type"), explode(col("pts")).as("p"))
        .select(col("event_type"), col("p._1").as("x"), round(col("p._2"), 6).as("y")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // LTTB re-derived in SQL: the sequential bucket walk becomes a
    // recursive CTE carrying only the previously-selected index; the
    // argmax and bucket boundaries replicate the kernel's double
    // arithmetic exactly (floor = toInt for positive doubles, ORDER BY
    // area DESC, idx ASC = strict-> keep-first), and centroids use
    // order-pinned list sums so FP summation order matches the kernel's
    // idx-ascending loop. Assumes every series has > n points (true for
    // the events fixture at every gate SF).
    "q_lttb" ->
      """WITH RECURSIVE
        |base AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP))::DOUBLE AS x, value AS y
        |  FROM events),
        |pts AS (
        |  SELECT event_type, x, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY x, y) - 1 AS idx,
        |    count(*) OVER (PARTITION BY event_type) AS m
        |  FROM base),
        |series AS (SELECT DISTINCT event_type, m FROM pts),
        |sel AS (
        |  SELECT event_type, -1 AS i, 0::BIGINT AS a, m FROM series
        |  UNION ALL
        |  SELECT s.event_type, s.i + 1,
        |    (SELECT p.idx FROM pts p
        |     WHERE p.event_type = s.event_type
        |       AND p.idx >= CAST(floor((s.i+1) * ((s.m-2)::DOUBLE / 7)) AS BIGINT) + 1
        |       AND p.idx < least(CAST(floor((s.i+2) * ((s.m-2)::DOUBLE / 7)) AS BIGINT) + 1, s.m - 1)
        |     ORDER BY abs(
        |        ((SELECT q.x FROM pts q WHERE q.event_type = s.event_type AND q.idx = s.a)
        |          - (SELECT CASE WHEN count(*) = 0 THEN (SELECT z.x FROM pts z WHERE z.event_type = s.event_type AND z.idx = s.m-1)
        |                    ELSE list_sum(list(r.x ORDER BY r.idx)) / count(*) END
        |             FROM pts r WHERE r.event_type = s.event_type
        |               AND r.idx >= least(CAST(floor((s.i+2) * ((s.m-2)::DOUBLE / 7)) AS BIGINT) + 1, s.m - 1)
        |               AND r.idx < least(CAST(floor((s.i+3) * ((s.m-2)::DOUBLE / 7)) AS BIGINT) + 1, s.m)))
        |        * (p.y - (SELECT q.y FROM pts q WHERE q.event_type = s.event_type AND q.idx = s.a))
        |        - ((SELECT q.x FROM pts q WHERE q.event_type = s.event_type AND q.idx = s.a) - p.x)
        |        * ((SELECT CASE WHEN count(*) = 0 THEN (SELECT z.y FROM pts z WHERE z.event_type = s.event_type AND z.idx = s.m-1)
        |                   ELSE list_sum(list(r.y ORDER BY r.idx)) / count(*) END
        |            FROM pts r WHERE r.event_type = s.event_type
        |              AND r.idx >= least(CAST(floor((s.i+2) * ((s.m-2)::DOUBLE / 7)) AS BIGINT) + 1, s.m - 1)
        |              AND r.idx < least(CAST(floor((s.i+3) * ((s.m-2)::DOUBLE / 7)) AS BIGINT) + 1, s.m))
        |           - (SELECT q.y FROM pts q WHERE q.event_type = s.event_type AND q.idx = s.a))
        |     ) DESC, p.idx ASC
        |     LIMIT 1) AS a, s.m
        |  FROM sel s WHERE s.i < 6
        |),
        |chosen AS (
        |  SELECT event_type, a AS idx FROM sel
        |  UNION ALL
        |  SELECT event_type, m - 1 FROM series
        |)
        |SELECT p.event_type, p.x, round(p.y, 6) AS y
        |FROM chosen c JOIN pts p ON p.event_type = c.event_type AND p.idx = c.idx
        |ORDER BY p.event_type NULLS FIRST, p.x NULLS FIRST, y NULLS FIRST""".stripMargin,
    "q_covar_matrix" ->
      """WITH w AS (SELECT
        |  covar_samp(l_quantity, l_quantity) AS c11, covar_samp(l_quantity, l_extendedprice) AS c12,
        |  covar_samp(l_quantity, l_discount) AS c13,
        |  covar_samp(l_extendedprice, l_quantity) AS c21, covar_samp(l_extendedprice, l_extendedprice) AS c22,
        |  covar_samp(l_extendedprice, l_discount) AS c23,
        |  covar_samp(l_discount, l_quantity) AS c31, covar_samp(l_discount, l_extendedprice) AS c32,
        |  covar_samp(l_discount, l_discount) AS c33
        |  FROM lineitem)
        |SELECT x, y, round(cov, 6) AS cov FROM (
        |  SELECT 'l_quantity' x, 'l_quantity' y, c11 cov FROM w
        |  UNION ALL SELECT 'l_quantity', 'l_extendedprice', c12 FROM w
        |  UNION ALL SELECT 'l_quantity', 'l_discount', c13 FROM w
        |  UNION ALL SELECT 'l_extendedprice', 'l_quantity', c21 FROM w
        |  UNION ALL SELECT 'l_extendedprice', 'l_extendedprice', c22 FROM w
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', c23 FROM w
        |  UNION ALL SELECT 'l_discount', 'l_quantity', c31 FROM w
        |  UNION ALL SELECT 'l_discount', 'l_extendedprice', c32 FROM w
        |  UNION ALL SELECT 'l_discount', 'l_discount', c33 FROM w)
        |ORDER BY x NULLS FIRST, y NULLS FIRST, cov NULLS FIRST""".stripMargin,
    "q_ks_test" ->
      """WITH li AS (SELECT l_returnflag g, l_quantity x FROM lineitem
        |  WHERE l_returnflag IN ('A','R')),
        |bv AS (SELECT x, sum(CASE WHEN g='A' THEN 1 ELSE 0 END) ca,
        |    sum(CASE WHEN g='R' THEN 1 ELSE 0 END) cr
        |  FROM li GROUP BY x),
        |c AS (SELECT x, sum(ca) OVER (ORDER BY x) cuma, sum(cr) OVER (ORDER BY x) cumr FROM bv),
        |t AS (SELECT cast(sum(ca) AS BIGINT) na, cast(sum(cr) AS BIGINT) nr FROM bv)
        |SELECT max(abs(cuma / CAST(na AS DOUBLE) - cumr / CAST(nr AS DOUBLE))) AS d_stat,
        |  max(na) AS n_a, max(nr) AS n_r
        |FROM c, t""".stripMargin,
    "q_cramers_theils" ->
      """WITH cells AS (SELECT l_returnflag a, l_linestatus b, count(*) nij
        |  FROM lineitem GROUP BY 1, 2),
        |ra AS (SELECT a, cast(sum(nij) AS BIGINT) ra FROM cells GROUP BY a),
        |cb AS (SELECT b, cast(sum(nij) AS BIGINT) cb FROM cells GROUP BY b),
        |t AS (SELECT cast(sum(nij) AS BIGINT) n, count(DISTINCT a) r,
        |    count(DISTINCT b) c FROM cells),
        |j AS (SELECT nij, ra, cb, n, r, c FROM cells
        |  JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN t),
        |agg AS (SELECT
        |    sum(pow(nij - CAST(ra AS DOUBLE)*cb/n, 2) / (CAST(ra AS DOUBLE)*cb/n)) chi2,
        |    sum(-(CAST(nij AS DOUBLE)/n) * ln(CAST(nij AS DOUBLE)/cb)) hu,
        |    max(n) nn, max(r) rr, max(c) cc FROM j),
        |h AS (SELECT sum(-(CAST(ra AS DOUBLE)/n) * ln(CAST(ra AS DOUBLE)/n)) ha
        |  FROM ra CROSS JOIN t)
        |SELECT round(sqrt(chi2 / nn / least(rr - 1, cc - 1)), 9) AS cramers_v,
        |  round((ha - hu) / ha, 9) AS theils_u
        |FROM agg CROSS JOIN h""".stripMargin,
    "q_sequence_next_node" ->
      """WITH s AS (SELECT user_id, ts, event_id, event_type,
        |    lead(event_type, 1) OVER w AS e1, lead(event_type, 2) OVER w AS e2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |m AS (SELECT user_id, e2, row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM s WHERE event_type = 'view' AND e1 = 'click')
        |SELECT user_id, e2 AS next_node FROM m WHERE rn = 1
        |ORDER BY user_id NULLS FIRST, next_node NULLS FIRST""".stripMargin,
    "q_sum_foreach" ->
      """WITH x AS (SELECT vec_id % 5 AS g,
        |    list_transform(embedding, t -> CAST(t AS DOUBLE)) AS v
        |  FROM embeddings),
        |e AS (SELECT g, i, sum(v[i]) AS s
        |  FROM x, unnest(range(1, 65)) AS r(i) GROUP BY g, i)
        |SELECT g, CAST(i AS INT) AS i, CAST(floor(s * 1e6 + 0.5) AS BIGINT) AS s6
        |FROM e
        |ORDER BY g NULLS FIRST, i NULLS FIRST, s6 NULLS FIRST""".stripMargin,
    "q_sum_resample" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |    CAST(floor((l_quantity - 1) / 10) AS INT) AS bk,
        |    sum(l_extendedprice) AS s
        |  FROM lineitem WHERE l_quantity >= 1 AND l_quantity < 51
        |  GROUP BY 1, 2),
        |groups AS (SELECT DISTINCT g FROM b),
        |grid AS (SELECT g, unnest(range(0, 5)) AS bk FROM groups),
        |f AS (SELECT grid.g, grid.bk, coalesce(s, 0) AS s
        |  FROM grid LEFT JOIN b ON b.g = grid.g AND b.bk = grid.bk)
        |SELECT g, CAST(bk AS INT) AS bk, CAST(floor(s + 0.5) AS BIGINT) AS s0
        |FROM f
        |ORDER BY g NULLS FIRST, bk NULLS FIRST, s0 NULLS FIRST""".stripMargin,
    "q_uniq_theta" ->
      """SELECT l_returnflag,
        |  cast(count(DISTINCT l_partkey) AS BIGINT) AS exact_nd,
        |  true AS theta_within_10pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q_sparkbar" ->
      """WITH counts AS (SELECT event_type, user_id % 10 AS bucket, count(*) cnt
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT event_type, max(cnt) mx FROM counts GROUP BY 1),
        |lev AS (SELECT c.event_type, bucket,
        |    CAST((cnt * 8 + mx - 1) // mx AS INT) AS level
        |  FROM counts c JOIN mx USING (event_type))
        |SELECT event_type,
        |  string_agg('▁▂▃▄▅▆▇█'[level:level], ''
        |    ORDER BY bucket) AS bar
        |FROM lev GROUP BY event_type
        |ORDER BY event_type NULLS FIRST, bar NULLS FIRST""".stripMargin
  )
}
