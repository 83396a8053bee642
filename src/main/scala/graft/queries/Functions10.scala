package graft.queries

import org.apache.spark.sql.SparkSession

/** Round-10 batch 29: the aggregate alias/spelling tail (reference
  * src/AggregateFunctions/registerAggregateFunctions.cpp — the median*
  * spellings of the quantile family, NULL-handling any variants,
  * approx_top_*, the sumMap spelling family, matrix covariance
  * AggregateFunctionVarianceMatrix.cpp, sample skew/kurtosis
  * AggregateFunctionStatisticsSimple.h, groupArrayLast,
  * distinctJSONPaths AggregateFunctionDistinctJSONPaths.cpp). Every
  * probe is a ChSql dialect query; the DuckDB oracle re-derives each
  * value from first principles (sorted-list indexing for the exact
  * quantile spellings, window running totals for the weighted ones).
  * groupArrayLast's arrival-order semantics are pinned separately in
  * ChSqlSpec over a single-partition frame; the oracle query below uses
  * an order-free group (all values equal) so the slice logic is
  * verified without depending on distributed arrival order. */
object Functions10 {

  val queries: Map[String, Q] = Map(
    "q_agg_spellings" -> { (s: SparkSession, dir: String) =>
      ordered(graft.sqlfront.ChSql.sql(s, dir,
        """SELECT l_returnflag AS g,
          |  median(l_linenumber) AS med,
          |  medianTDigest(l_linenumber) AS mtd,
          |  medianGK(100)(l_linenumber) AS mgk,
          |  medianExactLow(CAST(l_quantity AS DOUBLE)) AS mlo,
          |  medianExactHigh(CAST(l_quantity AS DOUBLE)) AS mhi,
          |  quantileExactLow(0.3)(CAST(l_quantity AS DOUBLE)) AS q30,
          |  quantileExactHigh(0.7)(CAST(l_quantity AS DOUBLE)) AS q70,
          |  toInt64(floor(medianTimingWeighted(l_linenumber, l_suppkey % 5 + 1) * 100)) AS mtw_c,
          |  toInt64(floor(medianExactWeighted(l_quantity, l_linenumber) * 100)) AS mew_c,
          |  toInt64(floor(medianInterpolatedWeighted(l_quantity, l_linenumber) * 1000000)) AS miw_ppm,
          |  toInt64(floor(skewSamp(l_quantity) * 1000000)) AS ss_ppm,
          |  toInt64(floor(kurtSamp(l_quantity) * 1000000)) AS ks_ppm,
          |  toInt64(floor(kurtPop(l_quantity) * 1000000)) AS kp_ppm,
          |  toInt64(floor(varSampStable(l_quantity) * 1000000)) AS vss_ppm,
          |  toInt64(floor(stddevPopStable(l_quantity) * 1000000)) AS sps_ppm,
          |  any(l_returnflag) AS anyv,
          |  anyLast(l_returnflag) AS alv,
          |  any_value(l_returnflag) AS av2,
          |  anyRespectNulls(nullif(l_returnflag, l_returnflag)) AS arn,
          |  count(*) AS n
          |FROM lineitem WHERE l_orderkey < 2000 GROUP BY g""".stripMargin))
    },

    "q_agg_spellings2" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT l_returnflag AS g,
          |  sumMap([l_linenumber], [CAST(l_quantity AS DOUBLE)]).keys AS sm_k,
          |  sumMap([l_linenumber], [CAST(l_quantity AS DOUBLE)]).values AS sm_v,
          |  sumMapFiltered([1, 2])([l_linenumber], [CAST(l_quantity AS DOUBLE)]).values AS smf_v,
          |  minMap([l_linenumber], [CAST(l_quantity AS DOUBLE)]).values AS mnm_v,
          |  maxMappedArrays([l_linenumber], [CAST(l_quantity AS DOUBLE)]).values AS mxm_v,
          |  approx_top_k(3)(l_linenumber) AS atk,
          |  approx_top_sum(2)(l_linenumber, CAST(l_quantity AS DOUBLE)) AS ats,
          |  groupBitmapXor(l_suppkey) AS gbx,
          |  transform(covarSampMatrix(l_quantity, l_extendedprice), __r -> transform(__r, __v -> CAST(floor(__v / 1000) AS BIGINT))) AS cvm,
          |  transform(covarPopMatrix(l_quantity, l_extendedprice), __r -> transform(__r, __v -> CAST(floor(__v / 1000) AS BIGINT))) AS cpm,
          |  distinctJSONPaths(concat('{"k', toString(l_linenumber), '": 1, "z": {"w": "x"}}')) AS jsd,
          |  distinctJSONPathsAndTypes(concat('{"k', toString(l_linenumber), '": 1, "z": {"w": "x"}}')) AS jsm,
          |  distinctDynamicTypes(element_at(['123', '"s"', 'true'], CAST(l_linenumber % 3 + 1 AS INT))) AS jdt
          |FROM lineitem WHERE l_orderkey < 2000 GROUP BY g ORDER BY g""".stripMargin)
    },

    // groupArrayLast slice logic over an order-free group (every value in
    // the group equals the key, so the last-N set is arrival-order
    // independent); true arrival-order semantics are pinned in ChSqlSpec.
    "q_group_array_last" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT l_orderkey AS k, groupArrayLast(3)(l_orderkey) AS gal,
          |  count(*) AS n
          |FROM lineitem WHERE l_orderkey < 500 GROUP BY k ORDER BY k""".stripMargin)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_spellings" ->
      """WITH base AS (SELECT l_returnflag g, l_linenumber ln,
        |    CAST(l_quantity AS DOUBLE) qty, l_suppkey % 5 + 1 w5
        |  FROM lineitem WHERE l_orderkey < 2000),
        |lists AS (SELECT g, list(qty ORDER BY qty) lq, count(*) n FROM base GROUP BY g),
        |ex AS (SELECT g,
        |    lq[(CASE WHEN n % 2 = 1 THEN n // 2 ELSE n // 2 - 1 END) + 1] mlo,
        |    lq[n // 2 + 1] mhi,
        |    lq[LEAST(CAST(floor(0.3 * n) AS BIGINT), n - 1) + 1] q30,
        |    lq[LEAST(CAST(floor(0.7 * n) AS BIGINT), n - 1) + 1] q70
        |  FROM lists),
        |mtw_by AS (SELECT g, ln x, sum(w5) w FROM base GROUP BY g, ln),
        |mtw_c AS (SELECT g, x, w, sum(w) OVER (PARTITION BY g ORDER BY x) cum FROM mtw_by),
        |mtw_t AS (SELECT g, sum(w) tw FROM mtw_by GROUP BY g),
        |mtw AS (SELECT c.g,
        |    min(CASE WHEN cum >= floor(1 + (tw - 1) * 0.5) THEN x END) lo,
        |    min(CASE WHEN cum >= ceil(1 + (tw - 1) * 0.5) THEN x END) hi,
        |    max(1 + (tw - 1) * 0.5) pos
        |  FROM mtw_c c JOIN mtw_t t ON c.g = t.g GROUP BY c.g),
        |mew_by AS (SELECT g, qty x, sum(ln) w FROM base GROUP BY g, qty),
        |mew_c AS (SELECT g, x, w, sum(w) OVER (PARTITION BY g ORDER BY x) cum FROM mew_by),
        |mew_t AS (SELECT g, sum(w) tw FROM mew_by GROUP BY g),
        |mew AS (SELECT c.g, min(CASE WHEN cum >= ceil(0.5 * tw) THEN x END) v
        |  FROM mew_c c JOIN mew_t t ON c.g = t.g GROUP BY c.g),
        |miw_p AS (SELECT c.g, x, (cum - w * 0.5) / tw AS p
        |  FROM mew_c c JOIN mew_t t ON c.g = t.g),
        |miw AS (SELECT g, CASE
        |    WHEN max(CASE WHEN p <= 0.5 THEN p END) IS NULL
        |      THEN min(CASE WHEN p >= 0.5 THEN x END)
        |    WHEN min(CASE WHEN p >= 0.5 THEN p END) IS NULL
        |      THEN max(CASE WHEN p <= 0.5 THEN x END)
        |    WHEN min(CASE WHEN p >= 0.5 THEN p END) = max(CASE WHEN p <= 0.5 THEN p END)
        |      THEN max(CASE WHEN p <= 0.5 THEN x END)
        |    ELSE max(CASE WHEN p <= 0.5 THEN x END)
        |      + (min(CASE WHEN p >= 0.5 THEN x END) - max(CASE WHEN p <= 0.5 THEN x END))
        |        * (0.5 - max(CASE WHEN p <= 0.5 THEN p END))
        |        / (min(CASE WHEN p >= 0.5 THEN p END) - max(CASE WHEN p <= 0.5 THEN p END))
        |  END v FROM miw_p GROUP BY g),
        |mo AS (SELECT g, avg(qty) mu, count(*)::DOUBLE n FROM base GROUP BY g),
        |mom AS (SELECT b.g,
        |    sum(pow(qty - mu, 2)) / max(mo.n) m2,
        |    sum(pow(qty - mu, 3)) / max(mo.n) m3,
        |    sum(pow(qty - mu, 4)) / max(mo.n) m4,
        |    sum(pow(qty - mu, 2)) / (max(mo.n) - 1) vs
        |  FROM base b JOIN mo ON b.g = mo.g GROUP BY b.g)
        |SELECT b.g,
        |  quantile_disc(b.ln, 0.5) AS med,
        |  quantile_disc(b.ln, 0.5) AS mtd,
        |  quantile_disc(b.ln, 0.5) AS mgk,
        |  max(ex.mlo) AS mlo, max(ex.mhi) AS mhi,
        |  max(ex.q30) AS q30, max(ex.q70) AS q70,
        |  CAST(floor(max(CASE WHEN mtw.lo = mtw.hi THEN CAST(mtw.lo AS DOUBLE)
        |    ELSE mtw.lo + (mtw.pos - floor(mtw.pos)) * (mtw.hi - mtw.lo) END) * 100) AS BIGINT) AS mtw_c,
        |  CAST(floor(max(mew.v) * 100) AS BIGINT) AS mew_c,
        |  CAST(floor(max(miw.v) * 1000000) AS BIGINT) AS miw_ppm,
        |  CAST(floor(max(m.m3 / pow(m.vs, 1.5)) * 1000000) AS BIGINT) AS ss_ppm,
        |  CAST(floor(max(m.m4 / pow(m.vs, 2)) * 1000000) AS BIGINT) AS ks_ppm,
        |  CAST(floor(max(m.m4 / pow(m.m2, 2)) * 1000000) AS BIGINT) AS kp_ppm,
        |  CAST(floor(max(m.vs) * 1000000) AS BIGINT) AS vss_ppm,
        |  CAST(floor(sqrt(max(m.m2)) * 1000000) AS BIGINT) AS sps_ppm,
        |  max(b.g) AS anyv,
        |  max(b.g) AS alv,
        |  max(b.g) AS av2,
        |  CAST(NULL AS VARCHAR) AS arn,
        |  count(*) AS n
        |FROM base b
        |JOIN ex ON b.g = ex.g
        |JOIN mtw ON b.g = mtw.g
        |JOIN mew ON b.g = mew.g
        |JOIN miw ON b.g = miw.g
        |JOIN mom m ON b.g = m.g
        |GROUP BY b.g
        |ORDER BY b.g NULLS FIRST""".stripMargin,

    "q_agg_spellings2" ->
      """WITH base AS (SELECT l_returnflag g, l_linenumber ln,
        |    CAST(l_quantity AS DOUBLE) qty, l_suppkey sk,
        |    CAST(l_extendedprice AS DOUBLE) ep
        |  FROM lineitem WHERE l_orderkey < 2000),
        |bykey AS (SELECT g, ln, sum(qty) sv, min(qty) mnv, max(qty) mxv,
        |    count(*) c FROM base GROUP BY g, ln),
        |maps AS (SELECT g,
        |    list(ln ORDER BY ln) sm_k,
        |    list(sv ORDER BY ln) sm_v,
        |    list(sv ORDER BY ln) FILTER (WHERE ln IN (1, 2)) smf_v,
        |    list(mnv ORDER BY ln) mnm_v,
        |    list(mxv ORDER BY ln) mxm_v
        |  FROM bykey GROUP BY g),
        |topk AS (SELECT g, list({'value': ln, 'count': c,
        |      'error': CAST(0 AS BIGINT)} ORDER BY c DESC, ln)
        |      FILTER (WHERE rc <= 3) atk
        |  FROM (SELECT g, ln, c, row_number() OVER (PARTITION BY g
        |      ORDER BY c DESC, ln) rc FROM bykey) GROUP BY g),
        |tops AS (SELECT g, list({'value': ln, 'count': CAST(sv AS BIGINT),
        |      'error': CAST(0 AS BIGINT)} ORDER BY sv DESC, ln)
        |      FILTER (WHERE rs <= 2) ats
        |  FROM (SELECT g, ln, sv, row_number() OVER (PARTITION BY g
        |      ORDER BY sv DESC, ln) rs FROM bykey) GROUP BY g),
        |xr AS (SELECT g, CAST(count(*) AS BIGINT) gbx FROM (
        |    SELECT g, sk FROM base GROUP BY g, sk HAVING count(*) % 2 = 1)
        |  GROUP BY g),
        |cov AS (SELECT g,
        |    [[CAST(floor(covar_samp(qty, qty) / 1000) AS BIGINT), CAST(floor(covar_samp(qty, ep) / 1000) AS BIGINT)],
        |     [CAST(floor(covar_samp(ep, qty) / 1000) AS BIGINT), CAST(floor(covar_samp(ep, ep) / 1000) AS BIGINT)]] cvm,
        |    [[CAST(floor(covar_pop(qty, qty) / 1000) AS BIGINT), CAST(floor(covar_pop(qty, ep) / 1000) AS BIGINT)],
        |     [CAST(floor(covar_pop(ep, qty) / 1000) AS BIGINT), CAST(floor(covar_pop(ep, ep) / 1000) AS BIGINT)]] cpm
        |  FROM base GROUP BY g),
        |jso AS (SELECT g,
        |    list_sort(list(DISTINCT 'k' || CAST(ln AS VARCHAR))) || ['z.w'] jsd,
        |    map(list_sort(list(DISTINCT 'k' || CAST(ln AS VARCHAR))) || ['z.w'],
        |        list_transform(list_sort(list(DISTINCT 'k' || CAST(ln AS VARCHAR))),
        |          __p -> ['Int64']) || [['String']]) jsm,
        |    list_sort(list(DISTINCT CASE ln % 3 WHEN 0 THEN 'Number'
        |      WHEN 1 THEN 'String' ELSE 'Bool' END)) jdt
        |  FROM base GROUP BY g)
        |SELECT m.g, m.sm_k, m.sm_v, m.smf_v, m.mnm_v, m.mxm_v,
        |  t.atk, ts.ats, coalesce(x.gbx, CAST(0 AS BIGINT)) AS gbx,
        |  c.cvm, c.cpm, j.jsd, j.jsm, j.jdt
        |FROM maps m JOIN topk t ON m.g = t.g JOIN tops ts ON m.g = ts.g
        |LEFT JOIN xr x ON m.g = x.g JOIN cov c ON m.g = c.g
        |JOIN jso j ON m.g = j.g
        |ORDER BY m.g NULLS FIRST""".stripMargin,

    "q_group_array_last" ->
      """SELECT l_orderkey AS k,
        |  list_transform(range(LEAST(count(*), 3)), __x -> l_orderkey) AS gal,
        |  count(*) AS n
        |FROM lineitem WHERE l_orderkey < 500 GROUP BY l_orderkey
        |ORDER BY k NULLS FIRST""".stripMargin
  )
}
