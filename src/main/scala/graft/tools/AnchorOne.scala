package graft.tools

/** Run specific reference anchors by name through the shared runner —
  * fast single-anchor iteration without the suite harness.
  * sbt "runMain graft.tools.AnchorOne <name> [<name> ...]" */
object AnchorOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    for (n <- args) {
      AnchorScout.runTest(spark, "/root/testdata/sf0.001", n) match {
        case Right(()) => println(s"PASS $n")
        case Left(why) => bad += 1; println(s"FAIL $n :: $why")
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
