package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink formats (SURVEY.md §2.1 input/output formats): CSV, JSON,
  * ORC, text round-trips through the same DataFrame surface, plus the
  * Memory (createDataFrame) and Merge (unionByName) storage analogs. */
class DataSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  def tmp(): String = java.nio.file.Files.createTempDirectory("ds").toString

  test("csv round-trip preserves rows and values") {
    val d = graft.core.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "source", "n_chars")
    val dir = tmp() + "/csv"
    d.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == d.count())
    val a = d.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val b = back.orderBy("doc_id").collect().map(r =>
      (r.getAs[Number]("doc_id").longValue, r.getString(1), r.getAs[Number]("n_chars").longValue))
    assert(a.sameElements(b))
  }

  test("json round-trip preserves nested struct") {
    val d = graft.core.Tables.t(spark, sf, "nation")
      .select(col("n_nationkey"), struct(col("n_name"), col("n_regionkey")).as("info"))
    val dir = tmp() + "/json"
    d.write.json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 25)
    assert(back.select("info.n_name").distinct().count() == 25)
  }

  test("orc round-trip") {
    val d = graft.core.Tables.t(spark, sf, "region")
    val dir = tmp() + "/orc"
    d.write.orc(dir)
    assert(spark.read.orc(dir).count() == 5)
  }

  test("text + regexp parse (Regexp input format analog)") {
    val dir = tmp() + "/txt"
    graft.core.Tables.t(spark, sf, "nation")
      .select(concat_ws("|", col("n_nationkey"), col("n_name"))).write.text(dir)
    val parsed = spark.read.text(dir)
      .select(regexp_extract(col("value"), "^([0-9]+)\\|(.*)$", 1).cast("int").as("k"),
        regexp_extract(col("value"), "^([0-9]+)\\|(.*)$", 2).as("name"))
    assert(parsed.filter(col("name") =!= "").count() == 25)
  }

  test("Memory engine analog: createDataFrame; Merge analog: unionByName") {
    import spark.implicits._
    val m1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val m2 = Seq((3, "c")).toDF("k", "v")
    assert(m1.unionByName(m2).count() == 3)
  }
}
