package graft.tools

/** Throwaway: statement traces for remaining probe failures. Delete
  * before round end. */
object GapProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[4]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val snippets = Seq(
      "SELECT arrayMin([[3], [1], [2]])",
      "SELECT 'Array min ', (arrayMin(array(1,2,3,4,5,6)))",
      "DROP TABLE IF EXISTS test_aggregation",
      "CREATE TABLE test_aggregation (x Array(Int)) ENGINE=TinyLog",
      "INSERT INTO test_aggregation VALUES ([1,2,3,4]), ([]), ([1,2,3])",
      "SELECT arrayMin(x) FROM test_aggregation",
      "SELECT arraySum(x) FROM test_aggregation",
      "SELECT arrayProduct([1,2,3,4,5,6]) as a, toTypeName(a)",
      "SELECT arrayProduct(array(1.0,2.0,3.0,4.0)) as a, toTypeName(a)",
      "SELECT arrayProduct([toDecimal64(1,8), toDecimal64(2,8), toDecimal64(3,8)]) as a, toTypeName(a)",
      "SELECT arrayMin([toDecimal32(1, 2), toDecimal32(2, 3)])")
    for (s <- snippets) {
      val r = try {
        val rows = graft.sqlfront.ChSql.sql(spark, sf, s).collect()
        s"OK ${rows.length} rows: " + rows.take(6).map(r0 =>
          (0 until r0.length).map(i => AnchorScout.render(r0.get(i))).mkString("\t")).mkString(" | ")
      } catch { case e: Throwable =>
        "FAIL " + Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(2).mkString(" ").take(200) }
      println(s"[p3] ${s.take(60)} -> $r")
    }
    spark.stop()
  }
}
