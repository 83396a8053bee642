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
    "00003_reinterpret_as_string",
    "00007_array",
    "00008_array_join",
    "00009_array_join_subquery",
    "00018_distinct_in_subquery",
    "00020_sorting_arrays",
    "00021_sorting_arrays",
    "00022_func_higher_order_and_constants",
    "00023_agg_select_agg_subquery",
    "00024_unused_array_join_in_subquery",
    "00025_implicitly_used_subquery_column",
    "00027_distinct_and_order_by",
    "00034_fixed_string_to_number",
    "00041_aggregation_remap",
    "00042_set",
    "00044_sorting_by_string_descending",
    "00045_sorting_by_fixed_string_descending",
    "00053_all_inner_join",
    "00060_date_lut",
    "00072_in_types",
    "00077_set_keys_fit_128_bits_many_blocks",
    "00078_string_concat",
    "00087_distinct_of_empty_arrays",
    "00098_6_union_all",
    "00098_7_union_all",
    "00098_8_union_all",
    "00098_9_union_all",
    "00098_a_union_all",
    "00098_b_union_all",
    "00098_g_union_all",
    "00098_h_union_all",
    "00114_float_type_result_of_division",
    "00125_array_element_of_array_of_tuple",
    "00127_group_by_concat",
    "00128_group_by_number_and_fixed_string",
    "00131_set_hashed",
    "00144_empty_regexp",
    "00145_empty_likes",
    "00151_tuple_with_array",
    "00156_array_map_to_constant",
    "00157_aliases_and_lambda_formal_parameters",
    "00166_functions_of_aggregation_states",
    "00173_compare_date_time_with_constant_string",
    "00174_compare_date_time_with_constant_string_in_in",
    "00175_counting_resources_in_subqueries",
    "00187_like_regexp_prefix",
    "00188_constants_as_arguments_of_aggregate_functions",
    "00196_float32_formatting",
    "00204_extract_url_parameter",
    "00218_like_regexp_newline")
  for (name <- curated)
    test(s"reference stateless $name matches its .reference output") {
      runTest(name)
    }
}
