package graft

import graft.ops.Mutations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MutationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("updateWhere changes only matching rows") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val out = Mutations.updateWhere(df, col("k") === 2, Map("v" -> lit(99.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0))
  }

  test("deleteWhere drops matching rows, null cond keeps row") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(50.0))).toDF("k", "v")
    val out = Mutations.deleteWhere(df, col("v") > 10).collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L)) // null predicate -> not deleted
  }

  test("copy-on-write rewriteTable swaps snapshot atomically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mut").toString + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
      .write.parquet(dir)
    Mutations.rewriteTable(spark, dir,
      df => Mutations.deleteWhere(df, col("k") === 2))
    val back = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    assert(back.toSeq == Seq(1L, 3L))
  }
}
