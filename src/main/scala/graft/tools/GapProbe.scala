package graft.tools

/** Throwaway probe main for dialect gaps (memory-documented pattern):
  * run CH-SQL snippets, print OK/FAIL, delete before round end. */
object GapProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[4]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val snippets = Seq(
      "DROP TABLE IF EXISTS probe_t",
      "CREATE TABLE probe_t (a UInt64, b String, c Nullable(Float64), d Date DEFAULT toDate('2020-01-01')) ENGINE = MergeTree() ORDER BY a",
      "INSERT INTO probe_t (a, b) VALUES (1, 'x'), (2, 'y')",
      "INSERT INTO probe_t VALUES (3, 'z', 1.5, '2021-02-03')",
      "SELECT a, b, c, d FROM probe_t ORDER BY a",
      "SELECT count() FROM probe_t",
      "DROP TABLE probe_t",
      "CREATE TABLE 03130_test (x Int32) ENGINE = Memory",
      "INSERT INTO 03130_test VALUES (7)",
      "SELECT x + 1 FROM 03130_test",
      "DROP TABLE 03130_test",
      "SELECT _CAST(42, 'String')",
      "SELECT emptyArrayUInt64(), emptyArrayString()",
      "SELECT date_add(YEAR, 3, toDate('2018-01-01'))",
      "CREATE TABLE probe_enum (e Enum8('a' = 1, 'b' = 2), t Tuple(x Int32, y String)) ENGINE = Memory",
      "INSERT INTO probe_enum VALUES ('a', (1, 'p'))",
      "SELECT e, t.x FROM probe_enum",
      "DROP TABLE probe_enum"
    )
    for (s <- snippets) {
      try {
        val rows = graft.sqlfront.ChSql.sql(spark, sf, s).collect()
        println(s"OK   ${s.take(70)} => ${rows.take(3).mkString("; ").take(90)}")
      } catch { case e: Throwable =>
        println(s"FAIL ${s.take(70)} :: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.map(_.trim).filter(_.nonEmpty).take(1).mkString.take(120)}")
      }
    }
    spark.stop()
  }
}
