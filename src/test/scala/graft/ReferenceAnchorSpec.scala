package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs a curated set of the reference's OWN stateless tests through the
  * dialect front-end and compares against their in-tree `.reference`
  * outputs verbatim (TSV rendering). This is the directest form of "a
  * user of the reference could run their queries here": the queries and
  * the expected bytes both come from the reference repo, untouched.
  *
  * Curation: deterministic tests over system.numbers/system.one or pure
  * literals, integer/string/array outputs (no float rendering, no
  * server-state dependencies). SET statements are ignored (server
  * tuning); each residual statement must be a SELECT.
  */
class ReferenceAnchorSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val base = "/root/reference/tests/queries/0_stateless"

  /** Delegates to the single shared runner (tools.AnchorScout.runTest):
    * must-fail semantics, FORMAT handling, TSV rendering and the
    * cache-release discipline all live there — the sweep and the suite
    * can never drift apart again. */
  private def runTest(name: String): Unit =
    graft.tools.AnchorScout.runTest(spark, sf, name) match {
      case Right(()) => ()
      case Left(why) => fail(s"$name :: $why")
    }

  /** The curated anchor list lives in src/test/resources/
    * reference_anchors.txt (one test name per line) — the single
    * authoritative count; AnchorScout sweeps diff against it. */
  private val curated: Seq[String] = {
    val in = getClass.getResourceAsStream("/reference_anchors.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(n => n.nonEmpty && !n.startsWith("#")).toVector
    finally in.close()
  }

  for (name <- curated)
    test(s"reference stateless $name matches its .reference output") {
      runTest(name)
    }

  test("AnchorScout blocklist rejects environment-class tests mechanically") {
    // 01586_columns_pruning is the canonical fork-killer: a must-fail
    // groupArray-of-1M-strings OOM. The scout must refuse to even run it.
    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/01586_columns_pruning.sql")), "UTF-8")
    assert(graft.tools.AnchorScout.isEnvClass("01586_columns_pruning", sql))
    // sleeps and unbounded numbers scans are also env-class
    assert(graft.tools.AnchorScout.isEnvClass("x", "SELECT sleep(3)"))
    assert(graft.tools.AnchorScout.isEnvClass("x",
      "SELECT * FROM system.numbers WHERE number = 5"))
    // plain deterministic tests are not
    assert(!graft.tools.AnchorScout.isEnvClass("x",
      "SELECT number FROM system.numbers LIMIT 3"))
    // every curated anchor stays curate-able under the blocklist
    for (n <- curated) {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$base/$n.sql")), "UTF-8")
      assert(!graft.tools.AnchorScout.isEnvClass(n, s), s"curated $n blocklisted")
    }
  }
}
