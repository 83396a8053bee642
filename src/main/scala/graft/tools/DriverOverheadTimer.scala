package graft.tools

/** Itemizes the fixed driver work inside one dialect-query construction:
  * Tables.registerAll (views + udafs), ClickBench.registerHits, the
  * system_numbers/system_one view churn, and the final spark.sql
  * analysis. Guide §1/§5: the driver should do almost no per-query work. */
object DriverOverheadTimer {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.core.Tables.session("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      // warm
      f
      val n = 10
      val t0 = System.nanoTime()
      for (_ <- 1 to n) f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/call")
    }
    time("Tables.registerAll")(graft.core.Tables.registerAll(spark, dir))
    time("Tables.registerUdafs")(graft.core.Tables.registerUdafs(spark))
    time("ClickBench.registerHits")(graft.queries.ClickBench.registerHits(spark, dir))
    time("system views (range+views)") {
      spark.range(0, 100000000L, 1, 1).toDF("number")
        .createOrReplaceTempView("system_numbers")
      spark.range(0, 1).toDF("dummy").createOrReplaceTempView("system_one")
    }
    val q = "SELECT SearchPhrase, COUNT(*) AS c FROM hits WHERE SearchPhrase <> '' GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"
    time("spark.sql analysis (cb_12 text)") { spark.sql(q) }
    time("ChSql.sql full construct (cb_12)") {
      graft.sqlfront.ChSql.sql(spark, dir, q)
    }
    spark.stop()
  }
}
