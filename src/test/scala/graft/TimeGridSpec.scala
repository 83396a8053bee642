package graft

import graft.ops.TimeGrid
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed grid evaluation (ops/TimeGrid.scala — explode +
  * keyed hash agg) must agree point-for-point with the ChSql
  * timeSeries* templates (single-expression scans over collected
  * samples), which are themselves pinned to the reference algorithm by
  * ChSqlSpec. Equivalence over real fixture data closes the loop:
  * template = semantics oracle, TimeGrid = the shape that scales. */
class TimeGridSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def templateGrid(fn: String, window: Long): Map[(String, Long), Option[Double]] =
    graft.sqlfront.ChSql.sql(spark, sf,
      s"""SELECT g, CAST(i AS BIGINT) * 100 AS gt, z AS v FROM (
         |  SELECT event_type AS g,
         |    $fn(0, 500, 100, $window)(CAST(event_id % 997 AS BIGINT), value) AS arr
         |  FROM events WHERE event_id < 300 GROUP BY event_type)
         |LATERAL VIEW posexplode(arr) t AS i, z""".stripMargin)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  private def samples = graft.core.Tables.t(spark, sf, "events")
    .filter(col("event_id") < 300)
    .select(col("event_type"), pmod(col("event_id"), lit(997)).as("ts"), col("value"))

  private def close(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
    case (None, None) => true
    case (Some(x), Some(y)) => math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x))
    case _ => false
  }

  test("extrapolatedToGrid(rate) matches the template point-for-point") {
    val want = templateGrid("timeSeriesRateToGrid", 200)
    val got = TimeGrid.extrapolatedToGrid(samples, Seq("event_type"),
        col("ts"), col("value"), 0, 500, 100, 200, isRate = true, "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keySet)
      assert(close(got(k), want(k)), s"$k: got ${got(k)} want ${want(k)}")
  }

  test("extrapolatedToGrid(delta) matches the template point-for-point") {
    val want = templateGrid("timeSeriesDeltaToGrid", 300)
    val got = TimeGrid.extrapolatedToGrid(samples, Seq("event_type"),
        col("ts"), col("value"), 0, 500, 100, 300, isRate = false, "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keySet)
      assert(close(got(k), want(k)), s"$k: got ${got(k)} want ${want(k)}")
  }

  test("resampleToGrid matches the staleness template point-for-point") {
    val want = templateGrid("timeSeriesResampleToGridWithStaleness", 150)
    val got = TimeGrid.resampleToGrid(samples, Seq("event_type"),
        col("ts"), col("value"), 0, 500, 100, 150, "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keySet)
      assert(close(got(k), want(k)), s"$k: got ${got(k)} want ${want(k)}")
  }

  test("instantToGrid(irate/idelta) matches the templates point-for-point") {
    for ((fn, isRate) <- Seq("timeSeriesInstantRateToGrid" -> true,
        "timeSeriesInstantDeltaToGrid" -> false)) {
      val want = templateGrid(fn, 250)
      val got = TimeGrid.instantToGrid(samples, Seq("event_type"),
          col("ts"), col("value"), 0, 500, 100, 250, isRate = isRate, "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toMap
      assert(got.keySet == want.keySet, fn)
      for (k <- want.keySet)
        assert(close(got(k), want(k)), s"$fn $k: got ${got(k)} want ${want(k)}")
    }
  }

  test("the plan has no per-group collect and no global sort") {
    val plan = TimeGrid.extrapolatedToGrid(samples, Seq("event_type"),
        col("ts"), col("value"), 0, 500, 100, 200, isRate = true, "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"))
    assert(!plan.toLowerCase.contains("cartesian"))
  }
}
