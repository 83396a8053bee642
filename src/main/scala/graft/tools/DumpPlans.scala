package graft.tools

import graft.SparkEntry
import graft.core.Tables
import java.nio.file.{Files, Paths}

/** Writes PLANS.md — formatted physical plans of the headline queries, so
  * plan quality (pushdown, broadcast, exchange count) is reviewable as an
  * artifact. Usage: runMain graft.tools.DumpPlans [sfDir] [outFile]. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = Tables.session("local[4]", 4)
    val headline = Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
      "q_asof_join", "q_dedup_minhash_lsh", "q_sim_topk",
      "q_window_session", "q_win_running",
      // round-2 scale rewrites — verify no single-partition stages
      "q_limit_with_ties", "q_paste_join", "q_with_fill",
      "q_dedup_embedding_lsh", "q_projection_route", "q_has_token_index",
      // round-3 additions — two-phase running totals + corpus ops
      "q_quantile_exact_weighted", "q_rank_corr", "q_bm25", "q_seq_packing",
      // round-6 additions — IVF ANN, exec UDF, boilerplate, regrid
      "q_sim_ann_ivf", "q_exec_udf", "q_boilerplate_filter",
      "q_vocab_coverage", "q_ts_regrid", "q_fn_space_curves",
      // TPC-H tail — EXISTS/NOT-EXISTS chain + market-share ratio
      "q21_waiting_supplier", "q8_market_share",
      // round-6 session 2 — cluster extraction + semantic dedup
      "q_dedup_components", "q_semantic_dedup", "q_dup_ngram_spans",
      // round-7 — hashed spans kernel, DDSketch, WKT, codec/NLP tails
      "q_quantile_dd", "q_fn_wkt", "q_fn_tonality", "q_fn_codec_tail",
      // round-8 — geo cells (map-side), partitioned NSW graph ANN
      "q_geo_cells", "q_sim_ann_nsw",
      // round-10 late — keyed union-sweep concurrency, moment-solve
      // regression (map-side only), grid-family explode shape
      "q_running_concurrency", "q_fn_ml_method", "q_ts_grid_family",
      // round-11 — scalar pretty-printer projection, MySQL-alias aggregates
      "q_fn_format_query", "q_agg_spellings3",
      // round-16 — ClickBench wide-agg rows (pin single-exchange
      // partial-agg shapes) + the rewritten one-pass ANN recall query
      "q_cb_10", "q_cb_11", "q_cb_18", "q_sim_ann_lsh")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans (headline queries, ")
      .append(sfDir).append(")\n\n")
    sb.append("Things to check per plan: `PushedFilters` / `ReadSchema` on the\n")
    sb.append("scan (pushdown + pruning), `BroadcastHashJoin` for dim joins,\n")
    sb.append("exchange count (one per semantic shuffle, none extra).\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // force AQE final plan
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(6000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
