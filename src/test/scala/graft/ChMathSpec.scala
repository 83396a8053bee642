package graft

import graft.functions.ChMath
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChMathSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("chDiv: x/0 -> ±Inf, 0/0 -> NaN, normal division exact") {
    import spark.implicits._
    val df = Seq((1.0, 0.0), (-2.0, 0.0), (0.0, 0.0), (6.0, 3.0)).toDF("a", "b")
      .select(ChMath.chDiv(col("a"), col("b")).as("d")).collect().map(_.getDouble(0))
    assert(df(0).isPosInfinity && df(1).isNegInfinity && df(2).isNaN && df(3) == 2.0)
  }

  test("ChSql divide() template matches CH semantics under ANSI mode") {
    val r = graft.sqlfront.ChSql.sql(spark, "/root/testdata/sf0.001",
      "SELECT divide(1, 0) AS a, divide(-1, 0) AS b, divide(0, 0) AS c, divide(7, 2) AS d")
      .collect()(0)
    assert(r.getDouble(0).isPosInfinity && r.getDouble(1).isNegInfinity)
    assert(r.getDouble(2).isNaN && r.getDouble(3) == 3.5)
  }

  test("chMod: x % 0 -> NaN") {
    import spark.implicits._
    val r = Seq((5.0, 0.0), (5.0, 3.0)).toDF("a", "b")
      .select(ChMath.chMod(col("a"), col("b")).as("m")).collect().map(_.getDouble(0))
    assert(r(0).isNaN && r(1) == 2.0)
  }
}
