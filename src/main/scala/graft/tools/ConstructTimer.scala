package graft.tools

/** Splits per-query wall time into CONSTRUCTION (DataFrame build:
  * dialect rewrite + analysis + temp-view registration) vs EXECUTION
  * (the .count() job), per guide §1 "measure first". Fixed construction
  * cost is pure driver overhead that serializes at high QPS — the
  * optimization target is to gate it, not to tune executors.
  * sbt "runMain graft.tools.ConstructTimer <query...>"  (no args = the
  * ClickBench suite + the headline dialect rows). */
object ConstructTimer {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.filter(_.startsWith("q_cb_")).toSeq.sorted
    // warm-up
    names.foreach(n => graft.SparkEntry.queries(n)(spark, dir).count())
    var cTot = 0.0; var eTot = 0.0
    val rows = names.map { n =>
      val q = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val df = q(spark, dir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      val (c, e) = ((t1 - t0) / 1e3, (t2 - t1) / 1e3)
      cTot += c; eTot += e
      (n, c, e)
    }
    rows.foreach { case (n, c, e) =>
      println(f"$n%-28s construct ${c / 1e3}%8.1f ms   execute ${e / 1e3}%8.1f ms")
    }
    println(f"TOTAL construct ${cTot / 1e6}%6.2f s   execute ${eTot / 1e6}%6.2f s")
    spark.stop()
  }
}
