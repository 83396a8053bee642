package graft.tools

/** Ad-hoc single-query timing/plan probe for perf work:
  * sbt "runMain graft.tools.Probe <queryName> [sfDir]" */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tables.session("local[32]", 32)
    val q = graft.SparkEntry.queries(name)
    q(spark, dir).count() // warm
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"[probe] pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    q(spark, dir).explain("formatted")
  }
}
