package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ORDER BY ... WITH FILL / INTERPOLATE (reference:
  * src/Processors/Transforms/FillingTransform.cpp — generates missing
  * rows on an arithmetic grid and interpolates other columns).
  */
object Fill {

  /** Fill integer gaps in `keyCol` on [from, to] step `step`: generate the
    * grid with sequence+explode (distributed — no driver loop), left-join
    * the data, and forward-fill `carryCols` with last(ignoreNulls) —
    * matching the reference's INTERPOLATE (col AS prev value) mode. */
  def withFillLong(spark: SparkSession, df: DataFrame, keyCol: String,
                   from: Long, to: Long, step: Long,
                   carryCols: Seq[String]): DataFrame = {
    val grid = spark.range(0, (to - from) / step + 1)
      .select((col("id") * step + from).as(keyCol))
    val joined = grid.join(df, Seq(keyCol), "left")
    val w = Window.orderBy(col(keyCol)).rowsBetween(Window.unboundedPreceding, 0)
    carryCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Same grid-fill for timestamps with a fixed interval (microseconds). */
  def withFillTimestamp(spark: SparkSession, df: DataFrame, tsCol: String,
                        fromMicros: Long, toMicros: Long, stepMicros: Long,
                        carryCols: Seq[String]): DataFrame = {
    val grid = spark.range(0, (toMicros - fromMicros) / stepMicros + 1)
      .select(timestamp_micros(col("id") * stepMicros + fromMicros).as(tsCol))
    val joined = grid.join(df, Seq(tsCol), "left")
    val w = Window.orderBy(col(tsCol)).rowsBetween(Window.unboundedPreceding, 0)
    carryCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
