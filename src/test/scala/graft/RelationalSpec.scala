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

  test("fixture schema guard: green on real fixtures, loud one-line diagnosis on drift") {
    // all 10 tables load clean through the guard
    Tables.all.foreach(n => Tables.t(spark, sf, n))
    // a synthetic wrong-schema fixture fails AT LOAD, naming the column
    val dir = java.nio.file.Files.createTempDirectory("fixguard").toString
    spark.range(3)
      .selectExpr("CAST(id AS STRING) AS r_regionkey", "'x' AS r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e = intercept[IllegalStateException](Tables.t(spark, dir, "region"))
    assert(e.getMessage.contains("region.r_regionkey") &&
      e.getMessage.contains("is string, expected int"), e.getMessage)
    // a missing column is also diagnosed by name
    spark.range(3).selectExpr("CAST(id AS INT) AS n_nationkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val e2 = intercept[IllegalStateException](Tables.t(spark, dir, "nation"))
    assert(e2.getMessage.contains("no column n_name"), e2.getMessage)
  }

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

class DictGetSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  test("dictGet enriches facts via broadcast without shuffling the fact side") {
    import org.apache.spark.sql.functions._
    val o = graft.core.Tables.t(spark, sf, "orders")
    val c = graft.core.Tables.t(spark, sf, "customer")
    val got = graft.ops.Ops.dictGet(o, c, col("o_custkey"), col("c_custkey"),
      (col("c_name"), "cust_name"), (col("c_mktsegment"), "segment"))
    assert(got.count() == o.count())           // left join: no row loss
    assert(got.filter(col("cust_name").isNull).count() == 0)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dictGet not broadcast:\n$plan")
  }

  test("keyedRunningTotal matches a plain keyed window, both modes") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val li = graft.core.Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      .agg(sum(col("l_quantity")).as("w"))
    for (inclusive <- Seq(true, false);
         bucket <- Seq(None, Some(floor(col("x") / 2000)))) {
      val hi = if (inclusive) 0L else -1L
      val want = li.withColumn("cw",
        coalesce(sum(col("w")).over(Window.partitionBy(col("g")).orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, hi)), lit(0.0)))
        .select("g", "x", "cw").collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val got = graft.ops.Ops.keyedRunningTotal(
        li, Seq(col("g")), col("x"), col("w"), "cw", inclusive, bucket)
        .select("g", "x", "cw").collect()
      assert(got.length == want.size)
      got.foreach { r =>
        val k = (r.getString(0), r.getDouble(1))
        assert(r.getDouble(2) == want(k),
          s"mismatch at $k (inclusive=$inclusive, bucket=${bucket.isDefined})")
      }
    }
  }
}
