package graft.tools

object MultiProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[4]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    for (st <- args) {
      println(s"-- $st")
      val df = graft.sqlfront.ChSql.sql(spark, "/root/testdata/sf0.001", st)
      df.show(20, truncate = false)
    }
    spark.stop()
  }
}
