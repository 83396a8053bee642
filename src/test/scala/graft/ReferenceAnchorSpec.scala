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
  }

  private val curated = Seq(
    "00001_select_1",
    "00002_system_numbers",
    "00007_array",
    "00008_array_join",
    "00009_array_join_subquery",
    "00020_sorting_arrays",
    "00021_sorting_arrays",
    "00022_func_higher_order_and_constants",
    "00023_agg_select_agg_subquery",
    // 00027_argMinMax: positional tuple access, toDateTime(num,'tz') and
    // DateTime+Int all land this round (pinned in ChSqlSpec); the
    // remaining blocker is toDate(num) days-since-epoch semantics.
    // 00169_join_constant_keys: CH silently resolves the ambiguous
    // duplicated column to the left table; Spark raises
    // AMBIGUOUS_REFERENCE — a name-resolution policy difference.
    "00041_aggregation_remap",
    "00044_sorting_by_string_descending",
    // 00052_all_left_join is excluded: its expected output assumes
    // join_use_nulls=0 (unmatched columns become type defaults, CH's
    // legacy default); this engine consistently uses NULL semantics —
    // the join_use_nulls=1 mode — like every other SQL engine.
    "00053_all_inner_join")

  for (name <- curated)
    test(s"reference stateless $name matches its .reference output") {
      runTest(name)
    }
}
