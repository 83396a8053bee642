package graft.tools

import org.apache.spark.sql.SparkSession

/** Full sweep of the reference performance-test corpus through the
  * dialect for acceptance (see PerfShapes). Prints one PASS/FAIL line
  * per `<query>` (`file.xml#idx`), then a reject-reason histogram — the
  * work-list for the next dialect enablers. Curate PASSing ids into
  * src/test/resources/perf_shapes.txt for PerfShapeSpec. */
object PerfShapeScout {
  def main(args: Array[String]): Unit = {
    val perfDir = new java.io.File(
      args.headOption.getOrElse("/root/reference/tests/performance"))
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    // resumable: skip files a previous (possibly OOM-killed or
    // wedged-and-timeout-killed) run already STARTED — a file that
    // printed any PASS/FAIL/DONE line is not retried, so a
    // non-cancellable hang poisons one file, not the sweep
    val (doneFiles: Set[String], wedgedFiles: Set[String]) =
      sys.env.get("PERF_SCOUT_RESUME")
        .filter(p => new java.io.File(p).exists()).map { p =>
          val lines = scala.io.Source.fromFile(p).getLines().toVector
          val began = lines.collect { case l if l.startsWith("BEGIN ") => l.drop(6).trim }.toSet
          val done = lines.flatMap { l =>
            if (l.startsWith("DONE ")) Some(l.drop(5).trim)
            else if (l.startsWith("PASS ") || l.startsWith("FAIL "))
              Some(l.drop(5).takeWhile(_ != '#').trim)
            else None
          }.toSet
          // BEGIN-without-terminal-marker: the file WEDGED the previous
          // JVM (or it was interrupted mid-file). Still skipped — a
          // non-cancellable hang must not poison the resumed sweep — but
          // recorded as an explicit FAIL below rather than silently
          // vanishing from the acceptance counts.
          (began ++ done, began -- done)
        }.getOrElse((Set.empty[String], Set.empty[String]))
    val files = perfDir.listFiles().filter(_.getName.endsWith(".xml"))
      .filter(f => only.isEmpty || only.exists(f.getName.startsWith))
      .filterNot(f => doneFiles(f.getName))
      .sortBy(_.getName)
    var pass = 0; var fail = 0
    val reasons = scala.collection.mutable.Map.empty[String, Int]
    for (w <- wedgedFiles.toSeq.sorted) {
      println(s"FAIL $w#* :: wedged/interrupted (resume-skipped)")
      fail += 1
      reasons("wedged/interrupted (resume-skipped)") =
        reasons.getOrElse("wedged/interrupted (resume-skipped)", 0) + 1
    }
    for (f <- files) {
      println(s"BEGIN ${f.getName}"); Console.out.flush()
      PerfShapes.loadFile(f) match {
        case Left(e) =>
          println(s"FAIL ${f.getName}#* :: $e"); fail += 1
        case Right(pf) =>
          val setupErr = PerfShapes.setup(spark, dir, pf)
          // a timed-out task may still be burning memory after cancel —
          // don't stack more doomed work from the same file on top of it
          var timedOut = false
          for ((q, i) <- pf.queries.zipWithIndex) {
            val id = s"${pf.name}#$i"
            (if (timedOut) Left("skipped: prior timeout in file")
             else setupErr.map(e => Left(s"setup: $e")).getOrElse(
               PerfShapes.runStmt(spark, dir, PerfShapes.prepareText(q, pf.subs)))
            ) match {
              case Right(_) => println(s"PASS $id"); pass += 1
              case Left(e) =>
                if (e == "timeout") timedOut = true
                println(s"FAIL $id :: $e"); fail += 1
                val key = e.take(80)
                reasons(key) = reasons.getOrElse(key, 0) + 1
            }
          }
          if (timedOut) { // let cancelled tasks drain before the next file
            spark.sparkContext.cancelAllJobs(); Thread.sleep(2000)
          }
      }
      println(s"DONE ${f.getName}")
      Console.out.flush()
    }
    println("SWEEP-COMPLETE")
    println(s"\n== $pass pass / $fail fail ==")
    println("\nTop reject reasons:")
    reasons.toSeq.sortBy(-_._2).take(40).foreach { case (r, n) =>
      println(f"$n%5d  $r")
    }
    spark.stop()
  }
}
