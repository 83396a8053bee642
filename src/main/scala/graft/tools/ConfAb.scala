package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B a set of session confs over a query sample: builds one session
  * per variant (fresh JVM state per run would be better, but conf-only
  * deltas measured back-to-back on a warmed JVM isolate the conf
  * effect), runs warm-up + median-of-3 like Bench, prints per-variant
  * totals. Guide §1: measure before touching configuration. */
object ConfAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sample: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq(
        // fat-middle representatives (0.2-0.5 s) + a few heavies
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "q_rollup", "q_uniq_approx", "q_window_tumble", "q_quantiles",
        "q_topk", "q_asof_join", "q_win_running", "q_limit_by",
        "q_any_join", "q_uniq_upto", "q_count_distinct",
        "q_groups_frame_sweep", "q_dedup_components", "q_ts_grid_scale",
        "q_series_decompose_stl", "q_cb_10", "q_cb_18", "q_cb_32")
    def run(label: String, extra: Map[String, String]): Double = {
      val b = SparkSession.builder()
        .master(s"local[$cpus]")
        .withExtensions(new graft.plans.GraftExtensions)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      extra.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      sample.foreach(n => graft.SparkEntry.queries(n)(spark, dir).count())
      val passes = (1 to 3).map { _ =>
        sample.map { n =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, dir).count()
          n -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }
      val med = sample.map(n => passes.map(_(n)).sorted.apply(1))
      println(f"$label%-14s total ${med.sum}%7.3f s   " +
        sample.zip(med).map { case (n, t) => f"$n=${t}%.2f" }.mkString(" "))
      spark.stop()
      // fully tear down so the next variant builds a fresh session
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      med.sum
    }
    run("base", Map.empty)
    run("coalesce", Map(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"))
    run("shj", Map("spark.sql.join.preferSortMergeJoin" -> "false"))
    run("aggpush", Map("spark.sql.parquet.aggregatePushdown" -> "true"))
    run("all", Map(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m",
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.parquet.aggregatePushdown" -> "true"))
    run("base2", Map.empty) // repeat to bound JIT/thermal drift
  }
}
