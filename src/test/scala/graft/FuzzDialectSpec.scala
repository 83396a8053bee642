package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Spark half of the differential dialect fuzzer: 1000 seeded random
  * expression trees over the CH-dialect surface must translate and
  * evaluate without error, deterministically. The cross-engine value diff
  * runs via tools/fuzz_check.py against DuckDB (same seed, same trees —
  * FUZZ.md records each round's run). */
class FuzzDialectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("1000 fuzzed dialect expressions translate, evaluate, and are deterministic") {
    val all = graft.tools.FuzzDialect.exprs(seed = 8L, n = 1000)
    assert(all.size == 1000)
    // determinism: the same seed must regenerate the identical trees
    // (otherwise the python replay would diff different expressions)
    val again = graft.tools.FuzzDialect.exprs(seed = 8L, n = 1000)
    assert(all.map(_.ch) == again.map(_.ch) && all.map(_.duck) == again.map(_.duck))
    all.grouped(50).zipWithIndex.foreach { case (batch, i) =>
      val df = graft.sqlfront.ChSql.sql(spark, sf,
        graft.tools.FuzzDialect.chSelect(batch, "doc_id < 20"))
      val rows = df.collect()
      assert(rows.length == 20, s"batch $i returned ${rows.length} rows")
    }
  }

  test("fuzzed aggregate and date queries translate, evaluate, and are deterministic") {
    val aggs = graft.tools.FuzzDialect.aggQueries(seed = 8L, n = 20)
    assert(aggs == graft.tools.FuzzDialect.aggQueries(seed = 8L, n = 20))
    aggs.take(5).foreach { a =>
      val rows = graft.sqlfront.ChSql.sql(spark, sf,
        graft.tools.FuzzDialect.chAggSelect(a)).collect()
      assert(rows.nonEmpty)
    }
    val dates = graft.tools.FuzzDialect.dateExprs(seed = 8L, n = 100)
    assert(dates == graft.tools.FuzzDialect.dateExprs(seed = 8L, n = 100))
    dates.grouped(25).foreach { b =>
      val rows = graft.sqlfront.ChSql.sql(spark, sf,
        graft.tools.FuzzDialect.chDateSelect(b, "o_orderkey < 50")).collect()
      assert(rows.nonEmpty)
    }
  }
}
