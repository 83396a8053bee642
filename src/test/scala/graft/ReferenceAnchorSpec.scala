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
    "00218_like_regexp_newline",
    "00312_position_case_insensitive_utf8",
    "00320_between",
    "00333_parser_number_bug",
    "00350_count_distinct",
    "00351_select_distinct_arrays_tuples",
    "00355_array_of_non_const_convertible_types",
    "00356_analyze_aggregations_and_union_all",
    "00360_to_date_from_string_with_datetime",
    "00389_concat_operator",
    "00403_to_start_of_day",
    "00404_null_literal",
    "00429_point_in_ellipses",
    "00436_fixed_string_16_comparisons",
    "00448_to_string_cut_to_zero",
    "00622_select_in_parens",
    "00624_length_utf8",
    "00647_select_numbers_with_offset",
    "00667_compare_arrays_of_different_types",
    "00680_duplicate_columns_inside_union_all",
    "00710_array_enumerate_dense",
    "00711_array_enumerate_variants",
    "00741_client_comment_multiline",
    "00752_low_cardinality_array_result",
    "00753_with_with_single_alias",
    "00761_lower_utf8_bug",
    "00762_date_comparsion",
    "00809_add_days_segfault",
    "00811_garbage",
    "00814_parsing_ub",
    "00817_with_simple",
    "00822_array_insert_default",
    "00834_date_datetime_cmp",
    "00836_numbers_table_function_zero",
    "00842_array_with_constant_overflow",
    "00854_multiple_join_asterisks",
    "00879_cast_to_decimal_crash",
    "00903_array_with_constant_function",
    "00906_low_cardinality_const_argument",
    "00911_tautological_compare",
    "00918_has_unsufficient_type_check",
    "00919_sum_aggregate_states_constants",
    "00920_multiply_aggregate_states_constants",
    "00928_multi_match_constant_constant",
    "00938_basename",
    "00964_os_thread_priority",
    "00968_roundAge",
    "00969_roundDuration",
    "00979_yandex_consistent_hash_fpe",
    "00983_summing_merge_tree_not_an_identifier",
    "00990_request_splitting",
    "00994_table_function_numbers_mt",
    "01010_partial_merge_join_const_and_lc",
    "01015_random_constant",
    "01020_function_char",
    "01020_having_without_group_by",
    "01024__getScalar",
    "01034_unknown_qualified_column_in_join",
    "01040_h3_get_resolution",
    "01051_scalar_optimization",
    "01312_case_insensitive_regexp",
    "01326_build_id",
    "01326_fixed_string_comparison_denny_crane",
    "01326_hostname_alias",
    "01328_bad_peephole_optimization",
    "01330_array_join_in_higher_order_function",
    "01352_generate_random_overflow",
    "01353_neighbor_overflow",
    "01373_summing_merge_tree_explicit_columns_definition",
    "01375_GROUP_BY_injective_elimination_dictGet_BAD_ARGUMENTS",
    "01380_coded_delta_exception_code",
    "01384_bloom_filter_bad_arguments",
    "01396_negative_datetime_saturate_to_zero",
    "01404_roundUpToPowerOfTwoOrZero_safety",
    "01411_xor_itai_shirav",
    "01413_if_array_uuid",
    "01417_update_permutation_crash",
    "01421_array_nullable_element_nullable_index",
    "01421_assert_in_in",
    "01422_array_nullable_element_nullable_index",
    "01457_compile_expressions_fuzzer",
    "01459_default_value_of_argument_type_nullptr_dereference",
    "01463_resample_overflow",
    "01471_top_k_range_check",
    "01475_fix_bigint_shift",
    "01479_cross_join_9855",
    "01491_nested_multiline_comments",
    "01513_ilike_like_cache",
    "01527_bad_aggregation_in_lambda",
    "01536_fuzz_cast",
    "01538_fuzz_aggregate",
    "01544_errorCodeToName",
    "01548_uncomparable_columns_in_keys",
    "01548_with_totals_having",
    "01561_aggregate_functions_of_key_with_join",
    "01581_to_int_inf_nan")
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
