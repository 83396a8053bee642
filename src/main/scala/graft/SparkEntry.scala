package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query inventories (one entry per implemented
  * operator from SURVEY.md §2).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — exercises scan/filter/hash-agg/sort end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.Relational.queries, graft.queries.Relational.oracleSql),
      (graft.queries.Windows.queries, graft.queries.Windows.oracleSql),
      (graft.queries.SpecialJoins.queries, graft.queries.SpecialJoins.oracleSql),
      (graft.queries.Functions.queries, graft.queries.Functions.oracleSql),
      (graft.queries.Aggregates.queries, graft.queries.Aggregates.oracleSql),
      (graft.queries.LlmOps.queries, graft.queries.LlmOps.oracleSql),
      (graft.queries.Engines.queries, graft.queries.Engines.oracleSql),
      (graft.queries.Streaming.queries, graft.queries.Streaming.oracleSql),
      (graft.queries.Functions2.queries, graft.queries.Functions2.oracleSql),
      (graft.queries.Misc.queries, graft.queries.Misc.oracleSql),
      (graft.queries.Functions3.queries, graft.queries.Functions3.oracleSql),
      (graft.queries.Misc2.queries, graft.queries.Misc2.oracleSql),
      (graft.queries.Functions4.queries, graft.queries.Functions4.oracleSql),
      (graft.queries.Misc3.queries, graft.queries.Misc3.oracleSql),
      (graft.queries.Misc4.queries, graft.queries.Misc4.oracleSql),
      (graft.queries.Functions5.queries, graft.queries.Functions5.oracleSql),
      (graft.queries.Aggregates2.queries, graft.queries.Aggregates2.oracleSql),
      (graft.queries.Aggregates3.queries, graft.queries.Aggregates3.oracleSql),
      (graft.queries.Aggregates4.queries, graft.queries.Aggregates4.oracleSql),
      (graft.queries.Aggregates5.queries, graft.queries.Aggregates5.oracleSql),
      (graft.queries.Aggregates6.queries, graft.queries.Aggregates6.oracleSql),
      (graft.queries.TimeSeries.queries, graft.queries.TimeSeries.oracleSql),
      (graft.queries.Geo.queries, graft.queries.Geo.oracleSql),
      (graft.queries.LlmOps2.queries, graft.queries.LlmOps2.oracleSql),
      (graft.queries.LlmOps3.queries, graft.queries.LlmOps3.oracleSql),
      (graft.queries.LlmOps4.queries, graft.queries.LlmOps4.oracleSql),
      (graft.queries.TpchMore.queries, graft.queries.TpchMore.oracleSql),
      (graft.queries.Functions6.queries, graft.queries.Functions6.oracleSql),
      (graft.queries.LlmOps5.queries, graft.queries.LlmOps5.oracleSql),
      (graft.queries.Aggregates7.queries, graft.queries.Aggregates7.oracleSql),
      (graft.queries.TpchMore2.queries, graft.queries.TpchMore2.oracleSql),
      (graft.queries.Functions7.queries, graft.queries.Functions7.oracleSql),
      (graft.queries.LlmOps6.queries, graft.queries.LlmOps6.oracleSql),
      (graft.queries.NlpTail.queries, graft.queries.NlpTail.oracleSql),
      (graft.queries.Functions8.queries, graft.queries.Functions8.oracleSql),
      (graft.queries.Functions9.queries, graft.queries.Functions9.oracleSql),
      (graft.queries.Functions10.queries, graft.queries.Functions10.oracleSql),
      (graft.queries.ClickBench.queries, graft.queries.ClickBench.oracleSql)
    )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
