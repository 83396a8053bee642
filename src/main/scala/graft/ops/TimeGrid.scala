package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed evaluation of the PromQL-style grid aggregates
  * (reference src/AggregateFunctions/AggregateFunctionTimeseries*.h) —
  * the scale path behind the ChSql timeSeries*ToGrid templates (which
  * are single-expression scans meant for bounded groups).
  *
  * Shape: each sample explodes to the grid points whose lookback window
  * contains it (fan-out bounded by window/step + 1), then ONE hash
  * aggregation on (keys, grid index) computes the per-window stats the
  * Prometheus extrapolation needs (count, first/last timestamp and
  * value); counter resets ride the same explode from lag() pairs. No
  * global sort, no per-group collect — every stage is keyed by
  * (keys, grid index) or finer, so the plan survives arbitrary key
  * cardinality and series length. */
object TimeGrid {

  /** timeSeriesRateToGrid / timeSeriesDeltaToGrid, one row per
    * (keys, grid_ts) with a nullable Double `out` column.
    * `ts` must be epoch seconds (LongType), grid parameters in seconds. */
  def extrapolatedToGrid(df: DataFrame, keys: Seq[String], ts: Column,
                         value: Column, start: Long, end: Long, step: Long,
                         window: Long, isRate: Boolean, out: String): DataFrame = {
    require(step > 0 && end >= start && window >= 0)
    val e0 = start + (end - start) / step * step
    val nGrid = ((e0 - start) / step + 1).toInt
    val kc = keys.map(col)

    val s = df.select(kc :+ ts.cast("long").as("__ts") :+
      value.cast("double").as("__v"): _*)

    // grid points whose window [t_i - w, t_i] contains the sample
    def gridRange(tsCol: Column, loTs: Column): Column = {
      val iMin = greatest(lit(0L), ceil((tsCol - start) / lit(step.toDouble)).cast("long"))
      val iMax = least(lit(nGrid - 1L),
        floor((loTs + window - start) / lit(step.toDouble)).cast("long"))
      when(iMin <= iMax, sequence(iMin, iMax)).otherwise(array().cast("array<bigint>"))
    }

    val perPoint = s
      .withColumn("__i", explode(gridRange(col("__ts"), col("__ts"))))
      .groupBy(kc :+ col("__i"): _*)
      .agg(count(lit(1)).as("__n"),
        min(col("__ts")).as("__ft"), max(col("__ts")).as("__lt"),
        min_by(col("__v"), col("__ts")).as("__fv"),
        max_by(col("__v"), col("__ts")).as("__lv"))

    // counter resets: consecutive pairs (prev, cur) with cur < prev add
    // prev to every grid point whose window holds BOTH samples
    val withResets = if (!isRate) perPoint.withColumn("__rs", lit(0.0)) else {
      val w = Window.partitionBy(kc: _*).orderBy(col("__ts"))
      val pairs = s
        .withColumn("__pv", lag(col("__v"), 1).over(w))
        .withColumn("__pts", lag(col("__ts"), 1).over(w))
        .filter(col("__pv").isNotNull && col("__v") < col("__pv"))
      val resets = pairs
        .withColumn("__i", explode(gridRange(col("__ts"), col("__pts"))))
        .groupBy(kc :+ col("__i"): _*)
        .agg(sum(col("__pv")).as("__rs"))
      perPoint.join(resets, keys :+ "__i", "left")
        .withColumn("__rs", coalesce(col("__rs"), lit(0.0)))
    }

    // full grid frame so empty points surface as NULL rows
    val gridFrame = s.select(kc: _*).distinct()
      .withColumn("__i", explode(sequence(lit(0L), lit(nGrid - 1L))))

    val joined = gridFrame.join(withResets, keys :+ "__i", "left")
      .withColumn("__gt", lit(start) + col("__i") * step)

    // Prometheus extrapolatedRate (ExtrapolatedValue.h:147-199)
    val si = (col("__lt") - col("__ft")).cast("double")
    val vd = col("__lv") - col("__fv") + col("__rs")
    val adbs = si / (col("__n") - 1)
    val dts0 = (col("__ft") - (col("__gt") - window)).cast("double")
    val dte0 = (col("__gt") - col("__lt")).cast("double")
    val dts1 = when(dts0 >= lit(1.1) * adbs, adbs / 2).otherwise(dts0)
    val dts2 =
      if (isRate)
        when(vd > 0 && col("__fv") >= 0, least(si * (col("__fv") / vd), dts1))
          .otherwise(dts1)
      else dts1
    val dte1 = when(dte0 >= lit(1.1) * adbs, adbs / 2).otherwise(dte0)
    val factor =
      if (isRate) (si + dts2 + dte1) / si / window
      else (si + dts2 + dte1) / si
    val result = when(col("__n").isNull || col("__n") < 2 ||
      col("__lt") === col("__ft"), lit(null).cast("double"))
      .otherwise(vd * factor)

    joined.select(kc :+ col("__gt").as("grid_ts") :+ result.as(out): _*)
  }

  /** timeSeriesInstantRateToGrid / timeSeriesInstantDeltaToGrid:
    * irate/idelta from the LAST consecutive sample pair at each grid
    * point, the older sample still inside the window. Shape: lag()
    * pairs (one keyed window) + backward ASOF join of the grid onto
    * the pairs (the union-sort trick) — no per-group collect. */
  def instantToGrid(df: DataFrame, keys: Seq[String], ts: Column,
                    value: Column, start: Long, end: Long, step: Long,
                    window: Long, isRate: Boolean, out: String): DataFrame = {
    require(step > 0 && end >= start && window >= 0)
    val e0 = start + (end - start) / step * step
    val kc = keys.map(col)
    val s = df.select(kc :+ ts.cast("long").as("__ts") :+
      value.cast("double").as("__v"): _*)
    val w = Window.partitionBy(kc: _*).orderBy(col("__ts"))
    val pairs = s
      .withColumn("__pv", lag(col("__v"), 1).over(w))
      .withColumn("__pts", lag(col("__ts"), 1).over(w))
      .filter(col("__pts").isNotNull)
    val grid = s.select(kc: _*).distinct()
      .withColumn("grid_ts", explode(sequence(lit(start), lit(e0), lit(step))))
    // latest pair whose NEWER sample is <= the grid point
    val joined = Ops.asofJoin(grid, pairs, keys,
      leftOn = col("grid_ts"), rightOn = col("__ts"), direction = "backward")
    val vd =
      if (isRate) when(col("__v") < col("__pv"), col("__v"))
        .otherwise(col("__v") - col("__pv")) // counter reset (irate)
      else col("__v") - col("__pv")
    val res =
      if (isRate) vd / (col("__ts") - col("__pts")).cast("double")
      else vd
    joined.select(kc :+ col("grid_ts") :+
      when(col("__pts").isNotNull && col("__pts") + window >= col("grid_ts") &&
        col("__ts") =!= col("__pts"), res).as(out): _*)
  }

  /** timeSeriesResampleToGridWithStaleness: last-value carry via the
    * union-sort ASOF join (one keyed shuffle, no per-group collect). */
  def resampleToGrid(df: DataFrame, keys: Seq[String], ts: Column,
                     value: Column, start: Long, end: Long, step: Long,
                     staleness: Long, out: String): DataFrame = {
    require(step > 0 && end >= start && staleness >= 0)
    val e0 = start + (end - start) / step * step
    val kc = keys.map(col)
    val s = df.select(kc :+ ts.cast("long").as("__sts") :+
      value.cast("double").as("__sv"): _*)
      // one sample per (keys, ts): latest write wins deterministically
      .groupBy(kc :+ col("__sts"): _*).agg(max(col("__sv")).as("__sv"))
    val grid = s.select(kc: _*).distinct()
      .withColumn("grid_ts", explode(sequence(lit(start), lit(e0), lit(step))))
    val joined = Ops.asofJoin(grid, s, keys,
      leftOn = col("grid_ts"), rightOn = col("__sts"), direction = "backward")
    joined.select(kc :+ col("grid_ts") :+
      when(col("__sts").isNotNull && col("__sts") + staleness >= col("grid_ts"),
        col("__sv")).as(out): _*)
  }
}
