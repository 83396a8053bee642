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

  private def render(v: Any): String = v match {
    case null => "\\N"
    case s: String => s
    case a: scala.collection.Seq[_] => a.map(renderNested).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => renderNested(r.get(i))).mkString("(", ",", ")")
    case b: Boolean => if (b) "1" else "0"
    // the reference's TSV trims trailing decimal zeros (0.00 -> 0)
    case d: java.math.BigDecimal =>
      val t = d.stripTrailingZeros
      if (t.scale < 0) t.setScale(0).toPlainString else t.toPlainString
    case d: scala.math.BigDecimal =>
      val t = d.underlying.stripTrailingZeros
      if (t.scale < 0) t.setScale(0).toPlainString else t.toPlainString
    case x => x.toString
  }
  private def renderNested(v: Any): String = v match {
    case s: String => "'" + s + "'"
    case other => render(other)
  }

  private def runTest(name: String): Unit = {
    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/$name.sql")), "UTF-8")
    val expected = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/$name.reference")), "UTF-8")
      .stripLineEnd
    // `; -- { serverError X }` marks the statement ENDING on that line as
    // must-fail: tag it before splitting so the annotation stays attached
    val tagged = sql.replaceAll(
      "(?m);\\s*--\\s*\\{\\s*serverError[^\\n]*", " @@MUST_FAIL@@;")
    val statements = tagged.split(";").map(_.trim)
      .map(_.linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n").trim)
      .filter(_.nonEmpty)
      .filterNot(_.toUpperCase.startsWith("SET "))
    val out = statements.flatMap { st0 =>
      val mustFail = st0.endsWith("@@MUST_FAIL@@")
      val st = st0.stripSuffix("@@MUST_FAIL@@").trim
      if (mustFail) {
        intercept[Exception] {
          graft.sqlfront.ChSql.sql(spark, sf, st).collect()
        }
        Seq.empty[String]
      } else
        graft.sqlfront.ChSql.sql(spark, sf, st).collect().toSeq.map { row =>
          (0 until row.length).map(i => render(row.get(i))).mkString("\t")
        }
    }.mkString("\n")
    assert(out == expected,
      s"\n== $name ==\n-- got --\n$out\n-- expected --\n$expected")
    // anchor DDL paths persist() materialized views; release them so the
    // shared test JVM's heap doesn't accumulate cached blocks
    spark.catalog.clearCache()
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
