package graft

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = Tables.session("local[4]", shufflePartitions = 4)
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("every declared query runs and has a matching oracle or none") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.limit(1).collect() // force execution of the plan head
    }
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries entry: $missing")
  }

  test("q1 pricing summary groups correctly") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length >= 4 && rows.length <= 8) // |returnflag| x |linestatus|
    val li = Tables.t(spark, sf, "lineitem")
    val total = rows.map(_.getAs[Long]("count_order")).sum
    import org.apache.spark.sql.functions._
    val expect = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total === expect)
  }

  test("limit_by keeps at most 2 rows per order") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_limit_by")(spark, sf)
    val over = df.groupBy(col("l_orderkey")).count().filter(col("count") > 2).count()
    assert(over === 0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
