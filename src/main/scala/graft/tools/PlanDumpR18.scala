package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` of named queries to plans/r18/<q>_<tag>.txt
  * (the judge checks plan claims against these files).
  * sbt "runMain graft.tools.PlanDumpR18 <tag> <query...>" */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail.toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Tables.session("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r18"))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r18/${n}_$tag.txt"), plan)
      println(s"wrote plans/r18/${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
