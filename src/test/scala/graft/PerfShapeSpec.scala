package graft

import org.scalatest.funsuite.AnyFunSuite

/** Acceptance regression over the reference's performance-test SQL
  * corpus (tests/performance XML files — HEAVY-operator shapes the
  * stateless anchors barely touch: hits-style wide aggregations,
  * multi-key topK, large IN sets, codec sweeps). The curated list in
  * src/test/resources/perf_shapes.txt was swept by
  * tools.PerfShapeScout; each entry `file.xml#idx` must keep parsing
  * AND executing through the dialect (downscaled inputs — see
  * tools.PerfShapes). One test per FILE (shared setup), all of the
  * file's curated query indices run inside it. */
class PerfShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val perfDir = new java.io.File("/root/reference/tests/performance")

  private val curated: Seq[(String, Seq[Int])] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/perf_shapes.txt"))
    try src.getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(f, i) = l.split("#", 2)
        (f, i.toInt)
      }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toSeq.sortBy(_._1)
    finally src.close()
  }

  for ((file, idxs) <- curated) {
    test(s"perf shape $file (${idxs.size} queries)") {
      graft.sqlfront.ChSql.resetSessionState(spark)
      val pf = graft.tools.PerfShapes.loadFile(new java.io.File(perfDir, file))
        .fold(e => fail(s"xml load failed: $e"), identity)
      // 120s bound (not the sweep's 30s): the shared test JVM runs 7
      // concurrent forks, and a 2s query can exceed 30s under that load
      val setupErr = graft.tools.PerfShapes.setup(spark, "/root/testdata/sf0.001", pf,
        timeout = scala.concurrent.duration.DurationInt(120).seconds)
      assert(setupErr.isEmpty, s"setup failed: ${setupErr.getOrElse("")}")
      for (i <- idxs) {
        assert(i < pf.queries.length, s"index $i out of range for $file")
        val r = graft.tools.PerfShapes.runStmt(spark, "/root/testdata/sf0.001",
          graft.tools.PerfShapes.prepareText(pf.queries(i), pf.subs),
          timeout = scala.concurrent.duration.DurationInt(120).seconds)
        assert(r.isRight, s"$file#$i rejected: ${r.left.getOrElse("")}")
      }
      graft.sqlfront.ChSql.resetSessionState(spark)
    }
  }
}
