package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregate-combinator analogs beyond -If/-State/-Merge (reference:
  * src/AggregateFunctions/Combinators — AggregateFunctionForEach.cpp,
  * AggregateFunctionResample.cpp). Both are expressed as plain
  * DataFrame plans, so partial aggregation and shuffle placement stay
  * with Catalyst.
  */
object Combinators {

  /** sumForEach: elementwise sum of an array column per group — result is
    * an array as long as the longest input. Shape: posexplode →
    * hash-agg on (group, position) (map-side combine) → re-collect in
    * position order. Two shuffles, both keyed finer or equal to the
    * group — no single-task stage. */
  def sumForEach(df: DataFrame, groupCols: Seq[Column], arrCol: Column,
                 out: String): DataFrame = {
    val exploded = df.select(groupCols :+ posexplode(arrCol).as(Seq("__pos", "__v")): _*)
    val names = exploded.columns.dropRight(2)
    val summed = exploded.groupBy((names.map(col) :+ col("__pos")): _*)
      .agg(sum(col("__v")).as("__s"))
    summed.groupBy(names.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__s")))),
        p => p.getField("__s")).as(out))
  }

  /** groupArrayInsertAt(default, size)(value, pos): per group, an array
    * with a[pos] = value (reference
    * src/AggregateFunctions/AggregateFunctionGroupArrayInsertAt.h — it
    * keeps an arbitrary value on position collisions; here collisions
    * resolve to the MINIMUM so results are deterministic on any engine).
    * Missing positions get `default`; length is `size` when given, else
    * max(pos) + 1 per group. Shape: hash-agg on (group, pos) with
    * map-side combine, then one hash-agg per group building the array
    * from a position map — both shuffles keyed at or finer than the
    * group, no single-task stage, no window. */
  def groupArrayInsertAt(df: DataFrame, groupCols: Seq[Column], value: Column, pos: Column,
                         default: Column, size: Option[Int], out: String): DataFrame = {
    val base = df.select(groupCols :+ value.as("__v") :+ pos.cast("int").as("__p"): _*)
    val capped = size.map(n => base.filter(col("__p") < n)).getOrElse(base)
    val names = capped.columns.dropRight(2)
    val perPos = capped.groupBy((names.map(col) :+ col("__p")): _*)
      .agg(min(col("__v")).as("__m"))
    val lenExpr = size.map(n => lit(n)).getOrElse(max(col("__p")) + 1)
    perPos.groupBy(names.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("__p"), col("__m")))).as("__map"),
        lenExpr.as("__n"))
      .select(names.map(col) :+
        transform(sequence(lit(0), col("__n") - 1),
          i => coalesce(element_at(col("__map"), i), default)).as(out): _*)
  }

  /** sumResample(start, end, step)(value, key): per group, an array of
    * `(end-start)/step` bucket sums of `value` where `key` falls in
    * [start + i*step, start + (i+1)*step); empty buckets are 0. */
  def sumResample(df: DataFrame, groupCols: Seq[Column], value: Column, key: Column,
                  start: Long, end: Long, step: Long, out: String): DataFrame = {
    val nb = ((end - start) / step).toInt
    val withBk = df.filter(key >= start && key < end)
      .select(groupCols :+ value.as("__v") :+
        floor((key - start) / step).cast("int").as("__bk"): _*)
    val names = withBk.columns.dropRight(2)
    val b = withBk.groupBy((names.map(col) :+ col("__bk")): _*)
      .agg(sum(col("__v")).as("__s"))
    val grid = b.select(names.map(col): _*).distinct()
      .select(names.map(col) :+ explode(sequence(lit(0), lit(nb - 1))).as("__bk"): _*)
    grid.join(b, names :+ "__bk", "left")
      .withColumn("__s", coalesce(col("__s"), lit(0.0)))
      .groupBy(names.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("__bk"), col("__s")))),
        p => p.getField("__s")).as(out))
  }
}
