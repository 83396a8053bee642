package graft.tools

/** Ad-hoc SQL probe: runs one ClickHouse-dialect query (or, with --raw,
  * plain Spark SQL) against the fixture catalog and prints the result.
  * sbt "runMain graft.tools.SqlProbe [--raw] <sql> [sfDir]" */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val raw = args.head == "--raw"
    val rest = if (raw) args.tail else args
    val sql = rest(0)
    val dir = rest.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.Tables.session("local[4]", 8)
    val df =
      if (raw) { graft.core.Tables.registerAll(spark, dir); spark.sql(sql) }
      else graft.sqlfront.ChSql.sql(spark, dir, sql)
    df.show(50, truncate = false)
  }
}
