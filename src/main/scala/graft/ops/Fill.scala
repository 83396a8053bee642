package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ORDER BY ... WITH FILL / INTERPOLATE (reference:
  * src/Processors/Transforms/FillingTransform.cpp — generates missing
  * rows on an arithmetic grid and interpolates other columns).
  *
  * Carry-forward is computed per coarse grid BUCKET plus one tiny
  * boundary pass, never through a single global window: each bucket
  * forward-fills locally, the per-bucket final values (a ≤`nBuckets`-row
  * table aggregated straight off the pre-join input) explode into
  * per-bucket incoming values in one tiny aggregation, and
  * `coalesce(local, incoming)` completes the fill. All heavy stages
  * are partitioned by bucket, so the operator scales with the grid.
  */
object Fill {

  /** Buckets in the fill grid — bounded so the boundary table is trivially
    * broadcastable; each bucket still holds grid/nBuckets points, keeping
    * all heavy work partitioned. */
  private val nBuckets = 64L

  /** Shared bucketed carry: `joined` must contain `keyCol` (orderable
    * numeric/timestamp), `gridIdx` = 0-based grid position of the row.
    * `data` is the pre-join input restricted to on-grid keys with
    * `dataIdx` its grid position: per-bucket finals are aggregated from
    * it directly, so the grid join + window subtree is derived exactly
    * once (the r9 shape forked `joined` into a second finals pass and
    * then ran an O(B²) theta-join + groupBy over the boundary table —
    * three stages this folds into one tiny explode-aggregate). */
  private def bucketedCarry(joined: DataFrame, data: DataFrame, keyCol: String,
                            gridIdx: Column, dataIdx: Column,
                            totalPoints: Long, carryCols: Seq[String]): DataFrame = {
    if (carryCols.isEmpty) return joined
    val bucketSize = math.max(1L, (totalPoints + nBuckets - 1) / nBuckets)
    val maxB = (totalPoints - 1) / bucketSize
    val withB = joined.withColumn("__b", (gridIdx / bucketSize).cast("long"))
    val wLocal = Window.partitionBy(col("__b")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = carryCols.foldLeft(withB) { (acc, c) =>
      acc.withColumn(s"__loc_$c", last(col(c), ignoreNulls = true).over(wLocal))
    }
    // Final non-null value per bucket per carry column, from the pre-join
    // data (identical values: grid-only rows are all-null and max_by's
    // null key condition ignores them). Map-side partial agg, ≤B rows out.
    val finalAggs = carryCols.map(c =>
      max_by(col(c), when(col(c).isNotNull, col(keyCol))).as(c))
    val finals = data.withColumn("__b", (dataIdx / bucketSize).cast("long"))
      .groupBy(col("__b")).agg(finalAggs.head, finalAggs.tail: _*)
    // Incoming value for bucket b = latest non-null final among buckets
    // < b: explode each bucket's final to every later bucket and keep the
    // latest source per target — one aggregation over ≤B² tiny rows, no
    // join and no unpartitioned window.
    val exploded = finals.withColumn("__src", col("__b"))
      .withColumn("__b",
        explode(when(col("__src") < maxB,
          sequence(col("__src") + 1, lit(maxB)))))
    val inAggs = carryCols.map(c =>
      max_by(col(c), when(col(c).isNotNull, col("__src"))).as(s"__in_$c"))
    val incoming = exploded.groupBy(col("__b")).agg(inAggs.head, inAggs.tail: _*)
    val merged = local.join(broadcast(incoming), Seq("__b"), "left")
    carryCols.foldLeft(merged) { (acc, c) =>
      acc.withColumn(c, coalesce(col(s"__loc_$c"), col(s"__in_$c")))
        .drop(s"__loc_$c", s"__in_$c")
    }.drop("__b")
  }

  /** Fill integer gaps in `keyCol` on [from, to] step `step`: generate the
    * grid with spark.range (distributed — no driver loop), left-join the
    * data, and forward-fill `carryCols` with last(ignoreNulls) —
    * matching the reference's INTERPOLATE (col AS prev value) mode. */
  def withFillLong(spark: SparkSession, df: DataFrame, keyCol: String,
                   from: Long, to: Long, step: Long,
                   carryCols: Seq[String]): DataFrame = {
    val points = (to - from) / step + 1
    val grid = spark.range(0, points)
      .select((col("id") * step + from).as(keyCol))
    val joined = grid.join(df, Seq(keyCol), "left")
    val idx = (col(keyCol) - from) / step
    // finals come from the pre-join data; restrict it to the keys the
    // grid join would keep (on-grid within [from, to])
    val onGrid = df.filter(col(keyCol) >= from && col(keyCol) <= to &&
      (col(keyCol) - from) % step === 0)
    bucketedCarry(joined, onGrid, keyCol, idx, idx, points, carryCols)
  }

  /** WITH FILL ... INTERPOLATE (col AS expr) — EXPRESSION mode (reference
    * FillingTransform.cpp: the interpolate expression is evaluated on the
    * previous OUTPUT row, so consecutive gap rows compound it). The
    * sequential chain is expressed declaratively: carry (last real grid
    * index, last real value) with the bucketed carry, then fold the
    * expression `distance` times with `aggregate(sequence(1, d), v0, f)`
    * — an O(gap) per-row loop inside codegen, never a sequential pass
    * over the whole grid.
    *
    * `interp` maps column name -> (previous-value Column => next Column).
    */
  def withFillInterpolate(spark: SparkSession, df: DataFrame, keyCol: String,
                          from: Long, to: Long, step: Long,
                          interp: Map[String, Column => Column],
                          timestampKey: Boolean = false): DataFrame = {
    val points = (to - from) / step + 1
    val gridExpr =
      if (timestampKey) timestamp_micros(col("id") * step + from)
      else col("id") * step + from
    val grid = spark.range(0, points).select(gridExpr.as(keyCol))
    val keyLong =
      if (timestampKey) unix_micros(col(keyCol)) else col(keyCol).cast("long")
    val idxExpr = (keyLong - from) / step
    // build the carry structs on the pre-join data so the same frame
    // serves both the grid join and the per-bucket finals
    val dfS = interp.keys.foldLeft(
      df.filter(keyLong >= from && keyLong <= to && (keyLong - from) % step === 0)) { (acc, c) =>
      acc.withColumn(s"__s_$c",
        when(col(c).isNotNull,
          struct(idxExpr.cast("long").as("i"), col(c).as("v"))))
    }
    val withStructs = grid.join(dfS, Seq(keyCol), "left")
      .withColumn("__gi", idxExpr.cast("long"))
    val carried = bucketedCarry(withStructs, dfS, keyCol, col("__gi"),
      idxExpr.cast("long"), points,
      interp.keys.map(c => s"__s_$c").toSeq)
    interp.foldLeft(carried) { case (acc, (c, f)) =>
      val s = col(s"__s_$c")
      val dist = (col("__gi") - s.getField("i")).cast("int")
      val filled = aggregate(sequence(lit(1), dist), s.getField("v"), (a, _) => f(a))
      acc.withColumn(c,
        coalesce(col(c), when(s.isNotNull && dist > 0, filled)))
        .drop(s"__s_$c")
    }.drop("__gi")
  }

  /** Same grid-fill for timestamps with a fixed interval (microseconds). */
  def withFillTimestamp(spark: SparkSession, df: DataFrame, tsCol: String,
                        fromMicros: Long, toMicros: Long, stepMicros: Long,
                        carryCols: Seq[String]): DataFrame = {
    val points = (toMicros - fromMicros) / stepMicros + 1
    val grid = spark.range(0, points)
      .select(timestamp_micros(col("id") * stepMicros + fromMicros).as(tsCol))
    val joined = grid.join(df, Seq(tsCol), "left")
    val micros = unix_micros(col(tsCol))
    val idx = (micros - fromMicros) / stepMicros
    val onGrid = df.filter(micros >= fromMicros && micros <= toMicros &&
      (micros - fromMicros) % stepMicros === 0)
    bucketedCarry(joined, onGrid, tsCol, idx, idx, points, carryCols)
  }
}
