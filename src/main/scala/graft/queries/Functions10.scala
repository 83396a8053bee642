package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  private def T(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.t(s, dir, n)

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

    // Complex results are rendered to engine-stable strings per the
    // driver-comparator contract (OutputSchemaSpec): integral doubles
    // floor to BIGINT before joining so both engines print identically.
    "q_agg_spellings2" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT l_returnflag AS g,
          |  array_join(transform(sumMap([l_linenumber], [CAST(l_quantity AS DOUBLE)]).keys, __k -> CAST(__k AS STRING)), ',') AS sm_k,
          |  array_join(transform(sumMap([l_linenumber], [CAST(l_quantity AS DOUBLE)]).values, __v -> CAST(CAST(floor(__v) AS BIGINT) AS STRING)), ',') AS sm_v,
          |  array_join(transform(sumMapFiltered([1, 2])([l_linenumber], [CAST(l_quantity AS DOUBLE)]).values, __v -> CAST(CAST(floor(__v) AS BIGINT) AS STRING)), ',') AS smf_v,
          |  array_join(transform(minMap([l_linenumber], [CAST(l_quantity AS DOUBLE)]).values, __v -> CAST(CAST(floor(__v) AS BIGINT) AS STRING)), ',') AS mnm_v,
          |  array_join(transform(maxMappedArrays([l_linenumber], [CAST(l_quantity AS DOUBLE)]).values, __v -> CAST(CAST(floor(__v) AS BIGINT) AS STRING)), ',') AS mxm_v,
          |  array_join(transform(approx_top_k(3)(l_linenumber), __t -> concat(__t.value, ':', __t.count)), ',') AS atk,
          |  array_join(transform(approx_top_sum(2)(l_linenumber, CAST(l_quantity AS DOUBLE)), __t -> concat(__t.value, ':', __t.count)), ',') AS ats,
          |  groupBitmapXor(bitmapBuild([l_suppkey])) AS gbx,
          |  array_join(transform(covarSampMatrix(l_quantity, l_extendedprice), __r -> array_join(transform(__r, __v -> CAST(CAST(floor(__v / 1000) AS BIGINT) AS STRING)), ':')), '|') AS cvm,
          |  array_join(transform(covarPopMatrix(l_quantity, l_extendedprice), __r -> array_join(transform(__r, __v -> CAST(CAST(floor(__v / 1000) AS BIGINT) AS STRING)), ':')), '|') AS cpm,
          |  array_join(distinctJSONPaths(concat('{"k', toString(l_linenumber), '": 1, "z": {"w": "x"}}')), ',') AS jsd,
          |  array_join(transform(map_entries(distinctJSONPathsAndTypes(concat('{"k', toString(l_linenumber), '": 1, "z": {"w": "x"}}'))), __e -> concat(__e.key, '=', array_join(__e.value, '+'))), ',') AS jsm,
          |  array_join(distinctDynamicTypes(element_at(['123', '"s"', 'true'], CAST(l_linenumber % 3 + 1 AS INT))), ',') AS jdt
          |FROM lineitem WHERE l_orderkey < 2000 GROUP BY g ORDER BY g""".stripMargin)
    },

    // Round-11: the uppercase MySQL-compat aggregate aliases from the
    // reference's registerAggregateFunctions.cpp alias list (BIT_AND/
    // BIT_OR/BIT_XOR -> groupBit*, VAR_/STDDEV_/COVAR_ pairs). Spark's
    // case-insensitive function resolution carries them; this row pins
    // the semantics against DuckDB's same-named aggregates.
    "q_agg_spellings3" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT l_returnflag AS g,
          |  CAST(BIT_AND(l_linenumber) AS BIGINT) AS ba,
          |  CAST(BIT_OR(l_linenumber) AS BIGINT) AS bo,
          |  CAST(BIT_XOR(l_linenumber) AS BIGINT) AS bx,
          |  toInt64(floor(VAR_POP(CAST(l_quantity AS DOUBLE)) * 1000000)) AS vp,
          |  toInt64(floor(VAR_SAMP(CAST(l_quantity AS DOUBLE)) * 1000000)) AS vs,
          |  toInt64(floor(STDDEV_POP(CAST(l_quantity AS DOUBLE)) * 1000000)) AS sp,
          |  toInt64(floor(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)) * 1000000)) AS ss,
          |  toInt64(floor(COVAR_POP(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)) * 1000000000)) AS cp,
          |  toInt64(floor(COVAR_SAMP(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)) * 1000000000)) AS cs
          |FROM lineitem WHERE l_orderkey < 4000 GROUP BY g ORDER BY g""".stripMargin)
    },

    // groupArrayLast slice logic over an order-free group (every value in
    // the group equals the key, so the last-N set is arrival-order
    // independent); true arrival-order semantics are pinned in ChSqlSpec.
    "q_group_array_last" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT l_orderkey AS k,
          |  array_join(transform(groupArrayLast(3)(l_orderkey), __v -> CAST(__v AS STRING)), ',') AS gal,
          |  count(*) AS n
          |FROM lineitem WHERE l_orderkey < 500 GROUP BY k ORDER BY k""".stripMargin)
    },

    // Round-10 batch 30: scalar/introspection tail — hyperbolics,
    // factorial, Joda unix render, KQL tuple sort, Dynamic/Variant
    // probes, the full 621-entry errorCodeToName table, revision(),
    // initializeAggregation round-trips.
    "q_fn_scalar_tail" -> { (s: SparkSession, dir: String) =>
      ordered(graft.sqlfront.ChSql.sql(s, dir,
        """SELECT p_partkey AS k,
          |  toInt64(floor(sinh(p_partkey % 5) * 1000000)) AS sh,
          |  toInt64(floor(cosh(p_partkey % 5) * 1000000)) AS ch,
          |  toInt64(floor(tanh(p_partkey % 5) * 1000000)) AS th,
          |  toInt64(floor(asinh(p_partkey % 5) * 1000000)) AS ash,
          |  toInt64(floor(acosh(1 + p_partkey % 5) * 1000000)) AS ach,
          |  toInt64(floor(atanh((p_partkey % 5) / 6.0) * 1000000)) AS ath,
          |  factorial(CAST(p_partkey % 21 AS INT)) AS fact,
          |  fromUnixTimestampInJodaSyntax(1609459200 + p_partkey * 61, 'yyyy-MM-dd HH:mm:ss') AS joda,
          |  array_join(transform(kql_array_sort_asc([3 * (p_partkey % 5), 3 * (p_partkey % 3) + 1, 5], [10, 20, 30]).a2, __v -> CAST(__v AS STRING)), ',') AS kqla,
          |  array_join(transform(kql_array_sort_desc([3 * (p_partkey % 5), 3 * (p_partkey % 3) + 1, 5], [10, 20, 30]).a2, __v -> CAST(__v AS STRING)), ',') AS kqld,
          |  dynamicType(element_at(['42', '-7', '3.5', 'true', 'word'], CAST(p_partkey % 5 + 1 AS INT))) AS dt,
          |  dynamicElement(element_at(['42', '-7', '3.5', 'true', 'word'], CAST(p_partkey % 5 + 1 AS INT)), 'Int64') AS de,
          |  errorCodeToName(CAST(p_partkey % 1100 AS INT)) AS ecn,
          |  revision() AS rev,
          |  initializeAggregation('sumState', p_partkey) AS init_sum,
          |  finalizeAggregation(initializeAggregation('uniqThetaState', p_partkey)) AS init_theta
          |FROM part WHERE p_partkey < 700""".stripMargin))
    },

    // Round-10 batch 31: the PromQL-style grid aggregate family
    // (timeSeriesRate/Delta/InstantRate/InstantDelta/Resample/LastTwo —
    // reference AggregateFunctionTimeseries*.h). Grid = 0..400 step 100,
    // rate/delta window 200 s, staleness 150 s; samples ts = event_id
    // (unique per key), exploded to one scalar row per grid point for
    // the driver comparator.
    "q_ts_grid_family" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT g, CAST(i AS BIGINT) * 100 AS gt,
          |  toInt64(floor(z.ra * 1000000)) AS rate_ppm,
          |  toInt64(floor(z.de * 1000000)) AS delta_ppm,
          |  toInt64(floor(z.ir * 1000000)) AS irate_ppm,
          |  toInt64(floor(z.idl * 1000000)) AS idelta_ppm,
          |  toInt64(floor(z.rsm * 1000000)) AS resample_ppm,
          |  l2t1, l2t2,
          |  toInt64(floor(l2v1 * 1000000)) AS l2v1_ppm,
          |  toInt64(floor(l2v2 * 1000000)) AS l2v2_ppm
          |FROM (
          |  SELECT event_type AS g,
          |    timeSeriesRateToGrid(0, 400, 100, 200)(CAST(event_id % 371 AS BIGINT), value) AS ra,
          |    timeSeriesDeltaToGrid(0, 400, 100, 200)(CAST(event_id % 371 AS BIGINT), value) AS de,
          |    timeSeriesInstantRateToGrid(0, 400, 100, 200)(CAST(event_id % 371 AS BIGINT), value) AS ir,
          |    timeSeriesInstantDeltaToGrid(0, 400, 100, 200)(CAST(event_id % 371 AS BIGINT), value) AS idl,
          |    timeSeriesResampleToGridWithStaleness(0, 400, 100, 150)(CAST(event_id % 371 AS BIGINT), value) AS rsm,
          |    try_element_at(timeSeriesLastTwoSamples(CAST(event_id % 371 AS BIGINT), value).timestamps, 1) AS l2t1,
          |    try_element_at(timeSeriesLastTwoSamples(CAST(event_id % 371 AS BIGINT), value).timestamps, 2) AS l2t2,
          |    try_element_at(timeSeriesLastTwoSamples(CAST(event_id % 371 AS BIGINT), value).values, 1) AS l2v1,
          |    try_element_at(timeSeriesLastTwoSamples(CAST(event_id % 371 AS BIGINT), value).values, 2) AS l2v2
          |  FROM events WHERE event_id < 200 GROUP BY event_type)
          |LATERAL VIEW posexplode(arrays_zip(ra, de, ir, idl, rsm)) t AS i, z
          |ORDER BY g, gt""".stripMargin)
    },

    // Round-10 batch 32: embedded-geobase region functions over the
    // reference's own test geobase (tests/config/regions_hierarchy.txt);
    // the oracle re-walks the hierarchy with a recursive CTE.
    "q_fn_regions" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT CAST(number AS INT) AS id,
          |  regionToCity(number) AS city,
          |  regionToArea(number) AS area,
          |  regionToDistrict(number) AS district,
          |  regionToCountry(number) AS country,
          |  regionToContinent(number) AS cont,
          |  regionToTopContinent(number) AS topcont,
          |  regionToPopulation(number) AS pop,
          |  regionToName(number) AS rname,
          |  regionIn(number, 2) AS in_usa,
          |  regionIn(5, number) AS has5,
          |  arrayStringConcat(arrayMap(__x -> toString(__x), regionHierarchy(number)), ',') AS hier
          |FROM system_numbers WHERE number < 15 ORDER BY id""".stripMargin)
    },

    // Round-10 batch 33: stochastic regression named surface — the
    // deterministic sufficient-statistics solve (MlMethods.scala) whose
    // 3x3 Cramer expansion the oracle mirrors operation-for-operation
    // (moments are integral-valued, so both engines hold exact doubles
    // and the solve is bit-identical).
    "q_fn_ml_method" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT g,
          |  toInt64(floor(try_element_at(lst, 2) * 1000000000)) AS lw1_n,
          |  toInt64(floor(try_element_at(lst, 3) * 1000000000)) AS lw2_n,
          |  toInt64(floor(try_element_at(lst, 4) * 1000000000)) AS lb_n,
          |  toInt64(floor(evalMLMethod(lst, 10, 5) * 1000000)) AS lpred,
          |  toInt64(floor(try_element_at(gst, 2) * 1000000000)) AS gw1_n,
          |  toInt64(floor(try_element_at(gst, 3) * 1000000000)) AS gw2_n,
          |  toInt64(floor(try_element_at(gst, 4) * 1000000000)) AS gb_n,
          |  toInt64(floor(evalMLMethod(gst, 10, 5) * 1000000)) AS gpred
          |FROM (
          |  SELECT l_linestatus AS g,
          |    stochasticLinearRegression(0.1, 0.0, 32, 'SGD')(
          |      toInt64(l_extendedprice * 100 + 0.5), toInt64(l_quantity),
          |      toInt64(l_discount * 100 + 0.5)) AS lst,
          |    stochasticLogisticRegression(0.1, 0.0, 32, 'SGD')(
          |      if(l_returnflag = 'R', 1, 0), toInt64(l_quantity),
          |      toInt64(l_discount * 100 + 0.5)) AS gst
          |  FROM lineitem GROUP BY g) ORDER BY g""".stripMargin)
    },

    // sequenceMatchEvents('(?1).*(?2)'): the matched events' timestamps
    // (earliest cond1, earliest cond2 after it), '' when unmatched.
    "q_sequence_match_events" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT user_id,
          |  arrayStringConcat(arrayMap(__x -> toString(__x),
          |    sequenceMatchEvents('(?1).*(?2)')(toUnixTimestamp(ts),
          |      event_type = 'signup', event_type = 'purchase')), ',') AS ev
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
    },

    // Round-10 batch 34: H3 index arithmetic. Cells are synthesized
    // from (base, res, digit) triples covering pentagons and invalid
    // K-axis leads; the oracle re-derives every operation with integer
    // arithmetic over the public H3 bit layout.
    "q_fn_h3" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """WITH cells AS (
          |  SELECT p_partkey AS k,
          |    576460752303423488 + (p_partkey % 6) * 4503599627370496
          |      + (p_partkey % 122) * 35184372088832
          |      + (shiftLeft(CAST(1 AS BIGINT), CAST(45 - 3 * (p_partkey % 6) AS INT)) - 1)
          |      + (p_partkey % 7) * intDiv(35184372088832 - shiftLeft(CAST(1 AS BIGINT), CAST(45 - 3 * (p_partkey % 6) AS INT)), 7) AS cell,
          |    p_partkey % 6 AS res
          |  FROM part WHERE p_partkey < 500)
          |SELECT k, cell,
          |  h3GetResolution(cell) AS res_out,
          |  h3GetBaseCell(cell) AS bc,
          |  h3IsValid(cell) AS valid,
          |  h3IsPentagon(cell) AS pent,
          |  h3IsResClassIII(cell) AS c3,
          |  h3ToString(cell) AS hs,
          |  stringToH3(h3ToString(cell)) AS rt,
          |  h3ToParent(cell, greatest(res - 1, 0)) AS par,
          |  h3ToCenterChild(cell, res + 2) AS cc,
          |  size(h3ToChildren(cell, res + 1)) AS nchild,
          |  h3NumHexagons(res) AS nhex,
          |  h3GetOriginIndexFromUnidirectionalEdge(1152921504606846976
          |    + (1 + k % 6) * 72057594037927936
          |    + (cell - 576460752303423488)) AS eo,
          |  h3UnidirectionalEdgeIsValid(1152921504606846976
          |    + (1 + k % 6) * 72057594037927936
          |    + (cell - 576460752303423488)) AS ev,
          |  try_element_at(h3GetUnidirectionalEdgesFromHexagon(cell), 2) AS ef2,
          |  size(h3GetUnidirectionalEdgesFromHexagon(cell)) AS nef
          |FROM cells ORDER BY k""".stripMargin)
    },

    // Round-10 batch 35: sqids (reference 02933_sqid test vectors pinned
    // in H3Spec); the oracle checks the decode∘encode identity plus the
    // canonical '86Rf07' vector.
    "q_fn_sqid" -> { (s: SparkSession, dir: String) =>
      graft.sqlfront.ChSql.sql(s, dir,
        """SELECT p_partkey AS k,
          |  try_element_at(sqidDecode(sqidEncode(p_partkey)), 1) AS rt,
          |  try_element_at(sqidDecode(sqidEncode(p_partkey, p_partkey % 97)), 2) AS rt2,
          |  length(sqidEncode(p_partkey)) >= 2 AS len_ok,
          |  sqidEncode(1, 2, 3) AS pinned,
          |  size(sqidDecode('invalid sqid!')) AS bad
          |FROM part WHERE p_partkey < 300 ORDER BY k""".stripMargin)
    },

    // Same grid semantics via the DISTRIBUTED path (ops/TimeGrid.scala:
    // explode-to-grid + keyed hash agg, lag-pair ASOF for instant, grid
    // ASOF for staleness) — the shape that scales; same parameters as
    // q_ts_grid_family so both paths face one oracle.
    "q_ts_grid_scale" -> { (s: SparkSession, dir: String) =>
      import org.apache.spark.sql.functions._
      val e = T(s, dir)("events").filter(col("event_id") < 200)
        .select(col("event_type"), pmod(col("event_id"), lit(371)).as("ts"),
          col("value"))
      val keys = Seq("event_type")
      val rate = graft.ops.TimeGrid.extrapolatedToGrid(
        e, keys, col("ts"), col("value"), 0, 400, 100, 200, isRate = true, "ra")
      val delta = graft.ops.TimeGrid.extrapolatedToGrid(
        e, keys, col("ts"), col("value"), 0, 400, 100, 200, isRate = false, "de")
      val irate = graft.ops.TimeGrid.instantToGrid(
        e, keys, col("ts"), col("value"), 0, 400, 100, 200, isRate = true, "ir")
      val rsm = graft.ops.TimeGrid.resampleToGrid(
        e, keys, col("ts"), col("value"), 0, 400, 100, 150, "rs")
      val joined = rate
        .join(delta, Seq("event_type", "grid_ts"))
        .join(irate, Seq("event_type", "grid_ts"))
        .join(rsm, Seq("event_type", "grid_ts"))
      ordered(joined.select(col("event_type").as("g"), col("grid_ts").as("gt"),
        floor(col("ra") * 1000000).cast("long").as("rate_ppm"),
        floor(col("de") * 1000000).cast("long").as("delta_ppm"),
        floor(col("ir") * 1000000).cast("long").as("irate_ppm"),
        floor(col("rs") * 1000000).cast("long").as("resample_ppm")))
    },

    // runningConcurrency (reference src/Functions/runningConcurrency.cpp)
    // via the keyed union-sweep in Ops.runningConcurrency — one window
    // per event_type, no self-join, no global sort.
    "q_running_concurrency" -> { (s: SparkSession, dir: String) =>
      import org.apache.spark.sql.functions._
      val e = T(s, dir)("events").filter(col("event_id") < 3000)
        .select(col("event_type"), col("event_id"),
          unix_timestamp(col("ts").cast("timestamp")).as("b"))
        .withColumn("e", col("b") + pmod(col("event_id"), lit(7)) * 60 + 60)
      ordered(graft.ops.Ops.runningConcurrency(
          e, Seq("event_type"), col("b"), col("e"), col("event_id"), "conc")
        .select(col("event_type"), col("event_id"), col("conc")))
    },

    // Round-11: formatQuery family (reference src/Functions/
    // formatQuery.cpp:184-205; canonical shapes pinned against the 02882
    // test anchor in QueryFormatSpec). Inputs are built per-row from
    // fixture keys; the OrNull forms return NULL on unparseable text.
    "q_fn_format_query" -> { (s: SparkSession, dir: String) =>
      ordered(graft.sqlfront.ChSql.sql(s, dir,
        """SELECT p_partkey,
          |  formatQuery(concat('SeLeCt ', toString(p_partkey))) AS f1,
          |  formatQuerySingleLine(concat('select p_partkey  from part  where p_partkey < ', toString(p_partkey), ' order by p_partkey desc limit 7')) AS f2,
          |  formatQuery(concat('select p_partkey from part where p_partkey < ', toString(p_partkey))) AS f3,
          |  formatQueryOrNull(concat('bad ', toString(p_partkey))) AS f4,
          |  formatQuerySingleLineOrNull('') AS f5,
          |  formatQuery(concat('insert into t', toString(p_partkey), ' values (1, 2)')) AS f6
          |FROM part WHERE p_partkey < 400""".stripMargin))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_spellings3" ->
      """SELECT l_returnflag AS g,
        |  CAST(bit_and(l_linenumber) AS BIGINT) AS ba,
        |  CAST(bit_or(l_linenumber) AS BIGINT) AS bo,
        |  CAST(bit_xor(l_linenumber) AS BIGINT) AS bx,
        |  CAST(floor(var_pop(CAST(l_quantity AS DOUBLE)) * 1000000) AS BIGINT) AS vp,
        |  CAST(floor(var_samp(CAST(l_quantity AS DOUBLE)) * 1000000) AS BIGINT) AS vs,
        |  CAST(floor(stddev_pop(CAST(l_quantity AS DOUBLE)) * 1000000) AS BIGINT) AS sp,
        |  CAST(floor(stddev_samp(CAST(l_quantity AS DOUBLE)) * 1000000) AS BIGINT) AS ss,
        |  CAST(floor(covar_pop(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)) * 1000000000) AS BIGINT) AS cp,
        |  CAST(floor(covar_samp(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)) * 1000000000) AS BIGINT) AS cs
        |FROM lineitem WHERE l_orderkey < 4000 GROUP BY g
        |ORDER BY g NULLS FIRST""".stripMargin,

    "q_fn_format_query" ->
      """SELECT p_partkey,
        |  'SELECT ' || cast(p_partkey AS VARCHAR) AS f1,
        |  'SELECT p_partkey FROM part WHERE p_partkey < ' || cast(p_partkey AS VARCHAR) || ' ORDER BY p_partkey DESC LIMIT 7' AS f2,
        |  'SELECT p_partkey' || chr(10) || 'FROM part' || chr(10) || 'WHERE p_partkey < ' || cast(p_partkey AS VARCHAR) AS f3,
        |  cast(NULL AS VARCHAR) AS f4,
        |  cast(NULL AS VARCHAR) AS f5,
        |  'INSERT INTO t' || cast(p_partkey AS VARCHAR) || ' FORMAT Values' AS f6
        |FROM part WHERE p_partkey < 400
        |ORDER BY p_partkey NULLS FIRST""".stripMargin,

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
        |topk AS (SELECT g, list(CAST(ln AS VARCHAR) || ':' || CAST(c AS VARCHAR)
        |      ORDER BY c DESC, ln)
        |      FILTER (WHERE rc <= 3) atk
        |  FROM (SELECT g, ln, c, row_number() OVER (PARTITION BY g
        |      ORDER BY c DESC, ln) rc FROM bykey) GROUP BY g),
        |tops AS (SELECT g, list(CAST(ln AS VARCHAR) || ':' || CAST(CAST(floor(sv) AS BIGINT) AS VARCHAR)
        |      ORDER BY sv DESC, ln)
        |      FILTER (WHERE rs <= 2) ats
        |  FROM (SELECT g, ln, sv, row_number() OVER (PARTITION BY g
        |      ORDER BY sv DESC, ln) rs FROM bykey) GROUP BY g),
        |xr AS (SELECT g, CAST(count(*) AS BIGINT) gbx FROM (
        |    SELECT g, sk FROM base GROUP BY g, sk HAVING count(*) % 2 = 1)
        |  GROUP BY g),
        |cov AS (SELECT g,
        |    CAST(CAST(floor(covar_samp(qty, qty) / 1000) AS BIGINT) AS VARCHAR) || ':' || CAST(CAST(floor(covar_samp(qty, ep) / 1000) AS BIGINT) AS VARCHAR)
        |      || '|' || CAST(CAST(floor(covar_samp(ep, qty) / 1000) AS BIGINT) AS VARCHAR) || ':' || CAST(CAST(floor(covar_samp(ep, ep) / 1000) AS BIGINT) AS VARCHAR) cvm,
        |    CAST(CAST(floor(covar_pop(qty, qty) / 1000) AS BIGINT) AS VARCHAR) || ':' || CAST(CAST(floor(covar_pop(qty, ep) / 1000) AS BIGINT) AS VARCHAR)
        |      || '|' || CAST(CAST(floor(covar_pop(ep, qty) / 1000) AS BIGINT) AS VARCHAR) || ':' || CAST(CAST(floor(covar_pop(ep, ep) / 1000) AS BIGINT) AS VARCHAR) cpm
        |  FROM base GROUP BY g),
        |jso AS (SELECT g,
        |    list_sort(list(DISTINCT 'k' || CAST(ln AS VARCHAR))) || ['z.w'] jsd,
        |    array_to_string(list_transform(list_sort(list(DISTINCT 'k' || CAST(ln AS VARCHAR))),
        |      __p -> __p || '=Int64') || ['z.w=String'], ',') jsm,
        |    list_sort(list(DISTINCT CASE ln % 3 WHEN 0 THEN 'Number'
        |      WHEN 1 THEN 'String' ELSE 'Bool' END)) jdt
        |  FROM base GROUP BY g)
        |SELECT m.g,
        |  array_to_string(m.sm_k, ',') AS sm_k,
        |  array_to_string(list_transform(m.sm_v, __v -> CAST(floor(__v) AS BIGINT)), ',') AS sm_v,
        |  array_to_string(list_transform(m.smf_v, __v -> CAST(floor(__v) AS BIGINT)), ',') AS smf_v,
        |  array_to_string(list_transform(m.mnm_v, __v -> CAST(floor(__v) AS BIGINT)), ',') AS mnm_v,
        |  array_to_string(list_transform(m.mxm_v, __v -> CAST(floor(__v) AS BIGINT)), ',') AS mxm_v,
        |  array_to_string(t.atk, ',') AS atk,
        |  array_to_string(ts.ats, ',') AS ats,
        |  coalesce(x.gbx, CAST(0 AS BIGINT)) AS gbx,
        |  c.cvm, c.cpm,
        |  array_to_string(j.jsd, ',') AS jsd, j.jsm,
        |  array_to_string(j.jdt, ',') AS jdt
        |FROM maps m JOIN topk t ON m.g = t.g JOIN tops ts ON m.g = ts.g
        |LEFT JOIN xr x ON m.g = x.g JOIN cov c ON m.g = c.g
        |JOIN jso j ON m.g = j.g
        |ORDER BY m.g NULLS FIRST""".stripMargin,

    "q_group_array_last" ->
      """SELECT l_orderkey AS k,
        |  array_to_string(list_transform(range(LEAST(count(*), 3)), __x -> l_orderkey), ',') AS gal,
        |  count(*) AS n
        |FROM lineitem WHERE l_orderkey < 500 GROUP BY l_orderkey
        |ORDER BY k NULLS FIRST""".stripMargin,

    "q_fn_scalar_tail" -> s"""WITH codes(code, cname) AS (VALUES $errorCodeValues),
        |base AS (SELECT p_partkey k, p_partkey % 5 m5, p_partkey % 3 m3,
        |    CAST(p_partkey % 21 AS INT) m21 FROM part WHERE p_partkey < 700)
        |SELECT k,
        |  CAST(floor((exp(m5) - exp(-m5)) / 2 * 1000000) AS BIGINT) AS sh,
        |  CAST(floor((exp(m5) + exp(-m5)) / 2 * 1000000) AS BIGINT) AS ch,
        |  CAST(floor((exp(2 * m5) - 1) / (exp(2 * m5) + 1) * 1000000) AS BIGINT) AS th,
        |  CAST(floor(ln(m5 + sqrt(m5 * m5 + 1.0)) * 1000000) AS BIGINT) AS ash,
        |  CAST(floor(ln(1 + m5 + sqrt(CAST((1 + m5) * (1 + m5) - 1 AS DOUBLE))) * 1000000) AS BIGINT) AS ach,
        |  CAST(floor(0.5 * ln((1 + m5 / 6.0) / (1 - m5 / 6.0)) * 1000000) AS BIGINT) AS ath,
        |  CAST(factorial(m21) AS BIGINT) AS fact,
        |  strftime(make_timestamp((1609459200 + k * 61) * 1000000), '%Y-%m-%d %H:%M:%S') AS joda,
        |  array_to_string(list_transform(list_sort([{'s': 3 * m5, 'v': 10}, {'s': 3 * m3 + 1, 'v': 20}, {'s': 5, 'v': 30}]), __e -> __e.v), ',') AS kqla,
        |  array_to_string(list_transform(list_reverse_sort([{'s': 3 * m5, 'v': 10}, {'s': 3 * m3 + 1, 'v': 20}, {'s': 5, 'v': 30}]), __e -> __e.v), ',') AS kqld,
        |  CASE m5 WHEN 0 THEN 'Int64' WHEN 1 THEN 'Int64' WHEN 2 THEN 'Float64'
        |    WHEN 3 THEN 'Bool' ELSE 'String' END AS dt,
        |  CASE m5 WHEN 0 THEN '42' WHEN 1 THEN '-7' ELSE NULL END AS de,
        |  coalesce(c.cname, '') AS ecn,
        |  CAST(54499 AS INT) AS rev,
        |  k AS init_sum,
        |  CAST(1 AS BIGINT) AS init_theta
        |FROM base LEFT JOIN codes c ON c.code = k % 1100
        |ORDER BY k NULLS FIRST, sh NULLS FIRST, ch NULLS FIRST, th NULLS FIRST,
        |  ash NULLS FIRST, ach NULLS FIRST, ath NULLS FIRST, fact NULLS FIRST,
        |  joda NULLS FIRST, kqla NULLS FIRST, kqld NULLS FIRST, dt NULLS FIRST,
        |  de NULLS FIRST, ecn NULLS FIRST, rev NULLS FIRST,
        |  init_sum NULLS FIRST, init_theta NULLS FIRST""".stripMargin,

    "q_ts_grid_family" ->
      """WITH base AS (SELECT event_type g, CAST(event_id % 371 AS BIGINT) ts, value v
        |  FROM events WHERE event_id < 200),
        |grid AS (SELECT DISTINCT g, gt FROM base,
        |  (SELECT unnest(range(0, 401, 100)) gt)),
        |win AS (SELECT gr.g, gr.gt, b.ts, b.v FROM grid gr
        |  JOIN base b ON b.g = gr.g AND b.ts <= gr.gt AND b.ts >= gr.gt - 200),
        |st AS (SELECT g, gt, count(*) n, min(ts) ft, max(ts) lt,
        |    arg_min(v, ts) fv, arg_max(v, ts) lv FROM win GROUP BY g, gt),
        |pairs AS (SELECT g, ts, v, lag(v) OVER (PARTITION BY g ORDER BY ts) pv,
        |    lag(ts) OVER (PARTITION BY g ORDER BY ts) pts FROM base),
        |rsts AS (SELECT gr.g, gr.gt,
        |    sum(CASE WHEN p.v < p.pv THEN p.pv ELSE 0 END) rs
        |  FROM grid gr JOIN pairs p ON p.g = gr.g AND p.ts <= gr.gt
        |    AND p.pts >= gr.gt - 200 GROUP BY gr.g, gr.gt),
        |ext AS (SELECT st.g, st.gt, st.n,
        |    CAST(st.lt - st.ft AS DOUBLE) si,
        |    st.lv - st.fv + coalesce(r.rs, 0) vdr,
        |    st.lv - st.fv vdd,
        |    CAST(st.lt - st.ft AS DOUBLE) / (st.n - 1) adbs,
        |    CAST(st.ft - (st.gt - 200) AS DOUBLE) dts,
        |    CAST(st.gt - st.lt AS DOUBLE) dte, st.fv
        |  FROM st LEFT JOIN rsts r ON st.g = r.g AND st.gt = r.gt
        |  WHERE st.n >= 2 AND st.lt > st.ft),
        |fin AS (SELECT g, gt,
        |    vdr * ((si
        |      + CASE WHEN vdr > 0 AND fv >= 0 THEN
        |          LEAST(si * (fv / vdr),
        |            CASE WHEN dts >= 1.1 * adbs THEN adbs / 2 ELSE dts END)
        |        ELSE CASE WHEN dts >= 1.1 * adbs THEN adbs / 2 ELSE dts END END
        |      + CASE WHEN dte >= 1.1 * adbs THEN adbs / 2 ELSE dte END) / si / 200) rate,
        |    vdd * ((si
        |      + CASE WHEN dts >= 1.1 * adbs THEN adbs / 2 ELSE dts END
        |      + CASE WHEN dte >= 1.1 * adbs THEN adbs / 2 ELSE dte END) / si) delta
        |  FROM ext),
        |inst AS (SELECT gr.g, gr.gt,
        |    arg_max(p.ts, p.ts) lts, arg_max(p.v, p.ts) lv,
        |    arg_max(p.pts, p.ts) pts, arg_max(p.pv, p.ts) pv
        |  FROM grid gr JOIN pairs p ON p.g = gr.g AND p.ts <= gr.gt
        |  GROUP BY gr.g, gr.gt),
        |instf AS (SELECT g, gt,
        |    CASE WHEN pts IS NULL OR pts + 200 < gt OR lts = pts THEN NULL
        |      ELSE (CASE WHEN v2 < pv2 THEN v2 ELSE v2 - pv2 END) / CAST(lts - pts AS DOUBLE) END irate,
        |    CASE WHEN pts IS NULL OR pts + 200 < gt OR lts = pts THEN NULL
        |      ELSE v2 - pv2 END idelta
        |  FROM (SELECT g, gt, lts, pts, lv v2, pv pv2 FROM inst)),
        |rsm AS (SELECT gr.g, gr.gt, arg_max(b.v, b.ts) rv, max(b.ts) rts
        |  FROM grid gr JOIN base b ON b.g = gr.g AND b.ts <= gr.gt
        |  GROUP BY gr.g, gr.gt),
        |l2 AS (SELECT g, max(CASE WHEN rn = 1 THEN ts END) l2t1,
        |    max(CASE WHEN rn = 2 THEN ts END) l2t2,
        |    max(CASE WHEN rn = 1 THEN v END) l2v1,
        |    max(CASE WHEN rn = 2 THEN v END) l2v2
        |  FROM (SELECT g, ts, v, row_number() OVER (PARTITION BY g ORDER BY ts DESC) rn
        |    FROM base) WHERE rn <= 2 GROUP BY g)
        |SELECT gr.g, gr.gt,
        |  CAST(floor(f.rate * 1000000) AS BIGINT) AS rate_ppm,
        |  CAST(floor(f.delta * 1000000) AS BIGINT) AS delta_ppm,
        |  CAST(floor(i.irate * 1000000) AS BIGINT) AS irate_ppm,
        |  CAST(floor(i.idelta * 1000000) AS BIGINT) AS idelta_ppm,
        |  CAST(floor(CASE WHEN r.rts IS NOT NULL AND r.rts + 150 >= gr.gt
        |    THEN r.rv END * 1000000) AS BIGINT) AS resample_ppm,
        |  l2.l2t1, l2.l2t2,
        |  CAST(floor(l2.l2v1 * 1000000) AS BIGINT) AS l2v1_ppm,
        |  CAST(floor(l2.l2v2 * 1000000) AS BIGINT) AS l2v2_ppm
        |FROM grid gr
        |LEFT JOIN fin f ON gr.g = f.g AND gr.gt = f.gt
        |LEFT JOIN instf i ON gr.g = i.g AND gr.gt = i.gt
        |LEFT JOIN rsm r ON gr.g = r.g AND gr.gt = r.gt
        |LEFT JOIN l2 ON gr.g = l2.g
        |ORDER BY gr.g, gr.gt""".stripMargin,

    "q_fn_regions" ->
      """WITH RECURSIVE geo(id, parent, type, pop) AS (VALUES
        |  (1,0,0,CAST(7000000000 AS BIGINT)), (2,10,3,CAST(330000000 AS BIGINT)),
        |  (3,2,4,CAST(5700000 AS BIGINT)), (4,3,5,CAST(330000 AS BIGINT)),
        |  (5,4,6,CAST(100000 AS BIGINT)), (6,12,3,CAST(1500000000 AS BIGINT)),
        |  (7,6,4,CAST(83000000 AS BIGINT)), (8,7,6,CAST(20000000 AS BIGINT)),
        |  (9,1,1,CAST(1000000000 AS BIGINT)), (10,9,1,CAST(600000000 AS BIGINT)),
        |  (11,1,1,CAST(5300000000 AS BIGINT)), (12,11,1,CAST(4700000000 AS BIGINT))),
        |names(id, rname) AS (VALUES (1,'World'), (2,'USA'), (3,'Colorado'),
        |  (4,'Boulder County'), (5,'Boulder'), (6,'China'), (7,'Sichuan'),
        |  (8,'Chengdu'), (9,'America'), (10,'North America'), (11,'Eurasia'),
        |  (12,'Asia')),
        |nums AS (SELECT CAST(unnest(range(15)) AS INT) id),
        |walk(start, cur, depth) AS (
        |  SELECT g.id, g.id, 0 FROM geo g
        |  UNION ALL
        |  SELECT w.start, g.parent, w.depth + 1 FROM walk w
        |  JOIN geo g ON g.id = w.cur WHERE g.parent <> 0),
        |anc AS (SELECT w.start, w.cur, w.depth, g.type FROM walk w
        |  JOIN geo g ON g.id = w.cur),
        |lk AS (SELECT start,
        |    coalesce(arg_min(cur, depth) FILTER (WHERE type = 6), 0) city,
        |    coalesce(arg_min(cur, depth) FILTER (WHERE type = 5), 0) area,
        |    coalesce(arg_min(cur, depth) FILTER (WHERE type = 4), 0) district,
        |    coalesce(arg_min(cur, depth) FILTER (WHERE type = 3), 0) country,
        |    coalesce(arg_min(cur, depth) FILTER (WHERE type = 1), 0) cont,
        |    coalesce(arg_max(cur, depth) FILTER (WHERE type = 1), 0) topcont,
        |    string_agg(CAST(cur AS VARCHAR), ',' ORDER BY depth) hier,
        |    bool_or(cur = 2) in_usa
        |  FROM anc GROUP BY start)
        |SELECT n.id,
        |  coalesce(l.city, 0) AS city, coalesce(l.area, 0) AS area,
        |  coalesce(l.district, 0) AS district, coalesce(l.country, 0) AS country,
        |  coalesce(l.cont, 0) AS cont, coalesce(l.topcont, 0) AS topcont,
        |  coalesce(g.pop, 0) AS pop, coalesce(nm.rname, '') AS rname,
        |  coalesce(l.in_usa, false) AS in_usa,
        |  n.id IN (SELECT cur FROM anc WHERE start = 5) AS has5,
        |  coalesce(l.hier, '') AS hier
        |FROM nums n
        |LEFT JOIN lk l ON l.start = n.id
        |LEFT JOIN geo g ON g.id = n.id
        |LEFT JOIN names nm ON nm.id = n.id
        |ORDER BY n.id""".stripMargin,

    "q_fn_ml_method" ->
      """WITH bb AS (SELECT l_linestatus g,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS DOUBLE) y,
        |    CAST(floor(l_quantity) AS DOUBLE) x1,
        |    CAST(floor(l_discount * 100 + 0.5) AS DOUBLE) x2,
        |    CASE WHEN l_returnflag = 'R' THEN 2.0 ELSE -2.0 END t
        |  FROM lineitem),
        |m AS (SELECT g, count(*)::DOUBLE n, sum(x1) s1, sum(x2) s2,
        |    sum(x1*x1) s11, sum(x1*x2) s12, sum(x2*x2) s22,
        |    sum(y) sy, sum(x1*y) s1y, sum(x2*y) s2y,
        |    sum(t) st, sum(x1*t) s1t, sum(x2*t) s2t
        |  FROM bb GROUP BY g),
        |sol AS (SELECT g,
        |    s11*(s22*n - s2*s2) - s12*(s12*n - s2*s1) + s1*(s12*s2 - s22*s1) AS det,
        |    s1y*(s22*n - s2*s2) - s12*(s2y*n - s2*sy) + s1*(s2y*s2 - s22*sy) AS dly1,
        |    s11*(s2y*n - s2*sy) - s1y*(s12*n - s2*s1) + s1*(s12*sy - s2y*s1) AS dly2,
        |    s11*(s22*sy - s2y*s2) - s12*(s12*sy - s2y*s1) + s1y*(s12*s2 - s22*s1) AS dlyb,
        |    s1t*(s22*n - s2*s2) - s12*(s2t*n - s2*st) + s1*(s2t*s2 - s22*st) AS dgt1,
        |    s11*(s2t*n - s2*st) - s1t*(s12*n - s2*s1) + s1*(s12*st - s2t*s1) AS dgt2,
        |    s11*(s22*st - s2t*s2) - s12*(s12*st - s2t*s1) + s1t*(s12*s2 - s22*s1) AS dgtb
        |  FROM m),
        |w AS (SELECT g, dly1/det lw1, dly2/det lw2, dlyb/det lb,
        |    dgt1/det gw1, dgt2/det gw2, dgtb/det gb FROM sol)
        |SELECT g,
        |  CAST(floor(lw1 * 1000000000) AS BIGINT) AS lw1_n,
        |  CAST(floor(lw2 * 1000000000) AS BIGINT) AS lw2_n,
        |  CAST(floor(lb * 1000000000) AS BIGINT) AS lb_n,
        |  CAST(floor((lw1 * CAST(10 AS DOUBLE) + lw2 * CAST(5 AS DOUBLE) + lb) * 1000000) AS BIGINT) AS lpred,
        |  CAST(floor(gw1 * 1000000000) AS BIGINT) AS gw1_n,
        |  CAST(floor(gw2 * 1000000000) AS BIGINT) AS gw2_n,
        |  CAST(floor(gb * 1000000000) AS BIGINT) AS gb_n,
        |  CAST(floor(1.0 / (1.0 + exp(-(gw1 * CAST(10 AS DOUBLE) + gw2 * CAST(5 AS DOUBLE) + gb))) * 1000000) AS BIGINT) AS gpred
        |FROM w ORDER BY g""".stripMargin,

    "q_sequence_match_events" ->
      """WITH b AS (SELECT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) e, event_type
        |  FROM events),
        |t1 AS (SELECT user_id, min(e) FILTER (WHERE event_type = 'signup') t1
        |  FROM b GROUP BY user_id),
        |t2 AS (SELECT t1.user_id, max(t1.t1) t1, min(b.e) t2
        |  FROM t1 LEFT JOIN b ON b.user_id = t1.user_id
        |    AND b.event_type = 'purchase' AND b.e > t1.t1
        |  GROUP BY t1.user_id)
        |SELECT user_id,
        |  CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL
        |    THEN CAST(t1 AS VARCHAR) || ',' || CAST(t2 AS VARCHAR) ELSE '' END AS ev
        |FROM t2 ORDER BY user_id""".stripMargin,

    "q_fn_h3" ->
      """WITH cells AS (SELECT p_partkey k,
        |    CAST(p_partkey % 6 AS BIGINT) res,
        |    CAST(p_partkey % 122 AS BIGINT) base,
        |    CAST(p_partkey % 7 AS BIGINT) d
        |  FROM part WHERE p_partkey < 500),
        |c2 AS (SELECT k, res, base, d,
        |    576460752303423488 + res * 4503599627370496 + base * 35184372088832
        |      + ((1::BIGINT << (45 - 3 * res)) - 1)
        |      + d * ((35184372088832 - (1::BIGINT << (45 - 3 * res))) // 7) cell
        |  FROM cells),
        |pb AS (SELECT unnest([4,14,24,38,49,58,63,72,83,97,107,117]) p)
        |SELECT k, cell,
        |  CAST(res AS INT) AS res_out,
        |  CAST(base AS INT) AS bc,
        |  NOT (base IN (SELECT p FROM pb) AND d = 1 AND res > 0) AS valid,
        |  (base IN (SELECT p FROM pb) AND (d = 0 OR res = 0)) AS pent,
        |  res % 2 = 1 AS c3,
        |  printf('%x', cell) AS hs,
        |  cell AS rt,
        |  CASE WHEN res = 0 THEN cell ELSE
        |    cell - 4503599627370496
        |      + (7 - d) * (((1::BIGINT << (45 - 3 * (res - 1))) - (1::BIGINT << (45 - 3 * res))) // 7)
        |  END AS par,
        |  cell + 2 * 4503599627370496
        |    - 7 * (((1::BIGINT << (45 - 3 * res)) - (1::BIGINT << (45 - 3 * (res + 2)))) // 7) AS cc,
        |  CASE WHEN base IN (SELECT p FROM pb) AND (d = 0 OR res = 0)
        |    THEN 6 ELSE 7 END AS nchild,
        |  2 + 120 * CAST(pow(7, res) AS BIGINT) AS nhex,
        |  cell AS eo,
        |  (NOT (base IN (SELECT p FROM pb) AND d = 1 AND res > 0))
        |    AND NOT (base IN (SELECT p FROM pb) AND (d = 0 OR res = 0)
        |             AND (1 + k % 6) = 1) AS ev,
        |  1152921504606846976 + 2 * 72057594037927936
        |    + (cell - 576460752303423488) AS ef2,
        |  6 AS nef
        |FROM c2 ORDER BY k""".stripMargin,

    "q_fn_sqid" ->
      """SELECT p_partkey AS k,
        |  p_partkey AS rt,
        |  p_partkey % 97 AS rt2,
        |  true AS len_ok,
        |  '86Rf07' AS pinned,
        |  0 AS bad
        |FROM part WHERE p_partkey < 300 ORDER BY k""".stripMargin,

    "q_ts_grid_scale" ->
      """WITH base AS (SELECT event_type g, CAST(event_id % 371 AS BIGINT) ts, value v
        |  FROM events WHERE event_id < 200),
        |grid AS (SELECT DISTINCT g, gt FROM base,
        |  (SELECT unnest(range(0, 401, 100)) gt)),
        |win AS (SELECT gr.g, gr.gt, b.ts, b.v FROM grid gr
        |  JOIN base b ON b.g = gr.g AND b.ts <= gr.gt AND b.ts >= gr.gt - 200),
        |st AS (SELECT g, gt, count(*) n, min(ts) ft, max(ts) lt,
        |    arg_min(v, ts) fv, arg_max(v, ts) lv FROM win GROUP BY g, gt),
        |pairs AS (SELECT g, ts, v, lag(v) OVER (PARTITION BY g ORDER BY ts) pv,
        |    lag(ts) OVER (PARTITION BY g ORDER BY ts) pts FROM base),
        |rsts AS (SELECT gr.g, gr.gt,
        |    sum(CASE WHEN p.v < p.pv THEN p.pv ELSE 0 END) rs
        |  FROM grid gr JOIN pairs p ON p.g = gr.g AND p.ts <= gr.gt
        |    AND p.pts >= gr.gt - 200 GROUP BY gr.g, gr.gt),
        |ext AS (SELECT st.g, st.gt, st.n,
        |    CAST(st.lt - st.ft AS DOUBLE) si,
        |    st.lv - st.fv + coalesce(r.rs, 0) vdr,
        |    st.lv - st.fv vdd,
        |    CAST(st.lt - st.ft AS DOUBLE) / (st.n - 1) adbs,
        |    CAST(st.ft - (st.gt - 200) AS DOUBLE) dts,
        |    CAST(st.gt - st.lt AS DOUBLE) dte, st.fv
        |  FROM st LEFT JOIN rsts r ON st.g = r.g AND st.gt = r.gt
        |  WHERE st.n >= 2 AND st.lt > st.ft),
        |fin AS (SELECT g, gt,
        |    vdr * ((si
        |      + CASE WHEN vdr > 0 AND fv >= 0 THEN
        |          LEAST(si * (fv / vdr),
        |            CASE WHEN dts >= 1.1 * adbs THEN adbs / 2 ELSE dts END)
        |        ELSE CASE WHEN dts >= 1.1 * adbs THEN adbs / 2 ELSE dts END END
        |      + CASE WHEN dte >= 1.1 * adbs THEN adbs / 2 ELSE dte END) / si / 200) rate,
        |    vdd * ((si
        |      + CASE WHEN dts >= 1.1 * adbs THEN adbs / 2 ELSE dts END
        |      + CASE WHEN dte >= 1.1 * adbs THEN adbs / 2 ELSE dte END) / si) delta
        |  FROM ext),
        |inst AS (SELECT gr.g, gr.gt,
        |    arg_max(p.ts, p.ts) lts, arg_max(p.v, p.ts) lv,
        |    arg_max(p.pts, p.ts) pts, arg_max(p.pv, p.ts) pv
        |  FROM grid gr JOIN pairs p ON p.g = gr.g AND p.ts <= gr.gt
        |    AND p.pts IS NOT NULL
        |  GROUP BY gr.g, gr.gt),
        |instf AS (SELECT g, gt,
        |    CASE WHEN pts IS NULL OR pts + 200 < gt OR lts = pts THEN NULL
        |      ELSE (CASE WHEN lv < pv THEN lv ELSE lv - pv END) / CAST(lts - pts AS DOUBLE) END irate
        |  FROM inst),
        |rsm AS (SELECT gr.g, gr.gt, arg_max(b.v, b.ts) rv, max(b.ts) rts
        |  FROM grid gr JOIN base b ON b.g = gr.g AND b.ts <= gr.gt
        |  GROUP BY gr.g, gr.gt)
        |SELECT gr.g, gr.gt,
        |  CAST(floor(f.rate * 1000000) AS BIGINT) AS rate_ppm,
        |  CAST(floor(f.delta * 1000000) AS BIGINT) AS delta_ppm,
        |  CAST(floor(i.irate * 1000000) AS BIGINT) AS irate_ppm,
        |  CAST(floor(CASE WHEN r.rts IS NOT NULL AND r.rts + 150 >= gr.gt
        |    THEN r.rv END * 1000000) AS BIGINT) AS resample_ppm
        |FROM grid gr
        |LEFT JOIN fin f ON gr.g = f.g AND gr.gt = f.gt
        |LEFT JOIN instf i ON gr.g = i.g AND gr.gt = i.gt
        |LEFT JOIN rsm r ON gr.g = r.g AND gr.gt = r.gt
        |ORDER BY gr.g NULLS FIRST, gr.gt NULLS FIRST, rate_ppm NULLS FIRST,
        |  delta_ppm NULLS FIRST, irate_ppm NULLS FIRST, resample_ppm NULLS FIRST""".stripMargin,

    "q_running_concurrency" ->
      """WITH base AS (SELECT event_type, event_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) b,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + (event_id % 7) * 60 + 60 e
        |  FROM events WHERE event_id < 3000),
        |ev AS (
        |  SELECT event_type, event_id, b AS t, 0 AS is_end, event_id AS tie FROM base
        |  UNION ALL
        |  SELECT event_type, event_id, e AS t, 1 AS is_end, NULL AS tie FROM base),
        |c AS (SELECT event_type, event_id, is_end,
        |    sum(1 - is_end) OVER w - sum(is_end) OVER w AS conc
        |  FROM ev WINDOW w AS (PARTITION BY event_type
        |    ORDER BY t, is_end DESC, tie ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, event_id, CAST(conc AS BIGINT) AS conc
        |FROM c WHERE is_end = 0
        |ORDER BY event_type NULLS FIRST, event_id NULLS FIRST, conc NULLS FIRST""".stripMargin
  )

  /** The reference's builtin error-code registry as SQL VALUES (derived
    * from src/Common/ErrorCodes.cpp via functions/Batch30.scala — the
    * oracle re-checks the lookup plumbing against the same public table). */
  private lazy val errorCodeValues: String =
    graft.functions.Batch30.errorCodeNames.toSeq.sortBy(_._1)
      .map { case (c, n) => s"($c, '$n')" }.mkString(", ")
}
