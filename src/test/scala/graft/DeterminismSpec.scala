package graft

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count independence: the oracle gate runs under whatever
  * parallelism the driver picks, so every declared query must produce
  * identical (canonicalized) results regardless of shuffle partitioning —
  * the single-node stand-in for "would this survive a 1000-executor
  * cluster re-partitioning the same data". */
class DeterminismSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"

  private def canon(spark: SparkSession, name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    val cols = df.columns.sorted
    df.collect().map { r =>
      cols.map { c =>
        r.get(r.fieldIndex(c)) match {
          case null => "\\N"
          case d: Double => f"$d%.10g"
          case x => x.toString
        }
      }.mkString("\t")
    }.toSeq
  }

  test("representative queries identical at 2 vs 13 shuffle partitions") {
    val names = Seq("q1_pricing_summary", "q_topk", "q_window_funnel",
      "q_dedup_minhash_lsh", "q_entropy", "q_win_running", "q_engine_collapsing",
      "q_fn_ema", "q_sim_topk",
      // round-11 codec rows: per-key executor work, must not depend on
      // partitioning
      "q_image_dhash", "q_audio_fp", "q_video_demux", "q_fn_format_query")
    val spark = SparkTestSession.spark
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val results = for (p <- Seq("2", "13")) yield {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        names.map(n => n -> canon(spark, n)).toMap
      }
      for (n <- names)
        assert(results(0)(n) == results(1)(n), s"$n differs across partition counts")
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
  }
}
