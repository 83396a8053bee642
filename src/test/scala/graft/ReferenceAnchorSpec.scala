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
  *
  * The corpus (1,150+ tests) dominates suite wall-clock, so it is
  * PARTITIONED round-robin into sibling suites ReferenceAnchorSpecA–F;
  * build.sbt's testGrouping forks each into its own JVM (own
  * SparkTestSession) and runs them concurrently. `sbt test` still runs
  * every anchor — the split changes wall-clock, not coverage.
  */
object ReferenceAnchors {
  val base = "/root/reference/tests/queries/0_stateless"

  /** The curated anchor list lives in src/test/resources/
    * reference_anchors.txt (one test name per line) — the single
    * authoritative count; AnchorScout sweeps diff against it. */
  val curated: Seq[String] = {
    val in = getClass.getResourceAsStream("/reference_anchors.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(n => n.nonEmpty && !n.startsWith("#")).toVector
    finally in.close()
  }

  val parts = 6
}

abstract class ReferenceAnchorPart(part: Int) extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Delegates to the single shared runner (tools.AnchorScout.runTest):
    * must-fail semantics, FORMAT handling, TSV rendering and the
    * cache-release discipline all live there — the sweep and the suite
    * can never drift apart again. */
  private def runTest(name: String): Unit =
    graft.tools.AnchorScout.runTest(spark, sf, name) match {
      case Right(()) => ()
      case Left(why) => fail(s"$name :: $why")
    }

  for ((name, i) <- ReferenceAnchors.curated.zipWithIndex
       if i % ReferenceAnchors.parts == part)
    test(s"reference stateless $name matches its .reference output") {
      runTest(name)
    }
}

class ReferenceAnchorSpecA extends ReferenceAnchorPart(0)
class ReferenceAnchorSpecB extends ReferenceAnchorPart(1)
class ReferenceAnchorSpecC extends ReferenceAnchorPart(2)
class ReferenceAnchorSpecD extends ReferenceAnchorPart(3)
class ReferenceAnchorSpecE extends ReferenceAnchorPart(4)
class ReferenceAnchorSpecF extends ReferenceAnchorPart(5)

/** The non-anchor guards that used to live inside ReferenceAnchorSpec;
  * runs with the main (non-anchor) test group. */
class ReferenceAnchorGuardSpec extends AnyFunSuite {
  import ReferenceAnchors.{base, curated}

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

  test("anchor partition covers every curated test exactly once") {
    val perPart = (0 until ReferenceAnchors.parts).map { p =>
      curated.zipWithIndex.count(_._2 % ReferenceAnchors.parts == p)
    }
    assert(perPart.sum == curated.length)
    assert(perPart.forall(n => n > 0))
  }
}
