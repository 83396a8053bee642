package graft
import org.scalatest.funsuite.AnyFunSuite
class EventsProbe extends AnyFunSuite {
  test("spark reads events ns timestamps via Tables.t") {
    val spark = SparkTestSession.spark
    val df = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType.typeName == "timestamp")
    assert(df.count() > 0)
    val r = df.selectExpr("min(ts)", "max(ts)").collect()(0)
    assert(r.getTimestamp(0).toString.startsWith("2024-01-01"))
  }
}
