package graft.tools

/** Throwaway probe (round-12): statement-by-statement trace of the
  * Distributed-engine test shape; delete before round end. */
object GapProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[4]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val snippets = Seq(
      "DROP TABLE IF EXISTS t",
      "DROP TABLE IF EXISTS d",
      "CREATE TABLE t (a String, b Int) ENGINE = TinyLog",
      "INSERT INTO t VALUES ('a', 0), ('a', 1), ('b', 0)",
      "SELECT * FROM t",
      "SELECT '---'",
      "CREATE TABLE d (a String, b Int) ENGINE = Distributed(test_shard_localhost, currentDatabase(), t)",
      "SELECT DISTINCT b FROM (SELECT a, b FROM d GROUP BY a, b) order by b",
      "DROP TABLE d",
      "SELECT arrayAvg([]) as x, toTypeName(x)",
      "select mapContains({'name':'zhangsan', 'age':'10'}, 'name')",
      "SELECT sign(-1.0E-4)",
      "SELECT arrayProduct([toDecimal64(1,8), toDecimal64(2,8), toDecimal64(3,8)]) as a, toTypeName(a)")
    for (s <- snippets) {
      val r = try {
        val rows = graft.sqlfront.ChSql.sql(spark, sf, s).collect()
        s"OK ${rows.length} rows: " + rows.take(5).map(r0 =>
          (0 until r0.length).map(i => AnchorScout.render(r0.get(i))).mkString("\t")).mkString(" | ")
      } catch { case e: Throwable =>
        "FAIL " + Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(2).mkString(" ").take(160) }
      println(s"[probe] ${s.take(70)} -> $r")
    }
    spark.stop()
  }
}
