package graft.tools

/** Debug: print analyzed plan of a dialect-routed query. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[2]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(graft.plans.ChDialect.key, "true")
    val df = spark.sql(args(0))
    println(df.queryExecution.analyzed.treeString)
    spark.conf.set(graft.plans.ChDialect.key, "false")
  }
}
