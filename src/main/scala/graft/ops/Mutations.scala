package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Mutations (reference: MutationsInterpreter.cpp ALTER UPDATE/DELETE,
  * InterpreterDeleteQuery lightweight DELETE) as copy-on-write Parquet
  * rewrites — the Spark-native equivalent of the reference's mutation
  * parts: read, transform, write new snapshot, swap.
  *
  * At cluster scale this is the same pattern Delta/Iceberg implement with
  * file-level granularity; here the unit is the whole table directory,
  * with the transform fully distributed.
  */
object Mutations {

  /** ALTER TABLE ... UPDATE col = value WHERE cond. */
  def updateWhere(df: DataFrame, cond: Column, assignments: Map[String, Column]): DataFrame =
    assignments.foldLeft(df) { case (acc, (c, v)) =>
      acc.withColumn(c, when(cond, v).otherwise(col(c)))
    }

  /** ALTER TABLE ... DELETE WHERE cond (lightweight delete = anti-filter). */
  def deleteWhere(df: DataFrame, cond: Column): DataFrame =
    df.filter(!coalesce(cond, lit(false)))

  /** Copy-on-write rewrite: apply a mutation and atomically swap the
    * table directory (write to tmp, rename). */
  def rewriteTable(spark: SparkSession, path: String,
                   mutate: DataFrame => DataFrame): Unit = {
    val tmp = path + ".mutating"
    mutate(spark.read.parquet(path)).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
