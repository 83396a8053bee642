package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs beyond dedup/quality filtering: relevance scoring (BM25),
  * deterministic stratified sampling, fixed-budget sequence packing, and
  * per-group rebalancing. All are declarative DataFrame plans: the
  * per-document work is map-side, the corpus-wide statistics are tiny
  * aggregates broadcast back, so every operator survives a 1000-executor
  * scale-up (reference: rankers/samplers around
  * src/Storages/MergeTree/MergeTreeIndexGin.cpp and the SAMPLE BY
  * machinery in src/Storages/MergeTree/MergeTreeData.cpp).
  */
object Corpus {

  /** Okapi BM25 scores for every document against a term set.
    *
    * `terms` must be a small DataFrame with a `word` column (it is
    * broadcast). Shape: explode corpus → per-(doc, word) tf → broadcast
    * semi-join with terms → per-doc score; N/avgdl come from a 1-row agg
    * crossed in via broadcast. No corpus-sized shuffle besides the tf
    * group-by, which is map-side combinable. */
  def bm25(docs: DataFrame, idCol: Column, tokensCol: Column,
           terms: DataFrame, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(idCol.as("doc_id"), tokensCol.as("toks"))
      .withColumn("dl", size(col("toks")))
    // Broadcast-filter the exploded corpus to the term set BEFORE any
    // aggregation: the tf/df shuffles then carry only term hits (tiny),
    // never the full corpus vocabulary.
    val words = base.select(col("doc_id"), col("dl"), explode(col("toks")).as("word"))
      .join(broadcast(terms.select(col("word"))), Seq("word"))
    val tf = words.groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val contrib = tf.join(broadcast(df), Seq("word"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("c",
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    base.join(contrib.groupBy(col("doc_id").as("d2")).agg(sum(col("c")).as("score")),
        col("doc_id") === col("d2"), "left")
      .select(col("doc_id"), col("dl"), coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** Deterministic stratified sampling: keep each row with its stratum's
    * fraction, decided by a salted md5 of the id — reproducible across
    * runs and engines, no RNG state, fully map-side. `fractions` maps
    * stratum value → fraction (16-bit hex threshold granularity). */
  def stratifiedSample(df: DataFrame, stratum: Column, idCol: Column,
                       fractions: Map[String, Double], defaultFraction: Double,
                       salt: String = "graft-strat-v1"): DataFrame = {
    val thresh = fractions.foldLeft(lit(f"${(defaultFraction * 65536).toInt}%04x")) {
      case (acc, (k, f)) => when(stratum === k, lit(f"${(f * 65536).toInt}%04x")).otherwise(acc)
    }
    df.filter(substring(md5(concat(lit(salt + ":"), idCol.cast("string"))), 1, 4) < thresh)
  }

  /** Fixed-budget sequence packing: assign documents, in `order`, to
    * consecutive bins of `budget` tokens (a document straddling a
    * boundary starts the next bin's count but keeps its bin by its
    * exclusive prefix). Uses the two-phase scale-safe running total —
    * no single-partition window. `order` values must be unique. */
  def packSequences(df: DataFrame, order: Column, tokenCount: Column,
                    budget: Long, out: String = "bin"): DataFrame =
    graft.ops.Ops.runningTotalExclusive(df, order, tokenCount, "__cum")
      .withColumn(out, (col("__cum") / budget).cast("long"))
      .drop("__cum")

  /** Per-group rebalancing: keep at most `cap` rows per group, chosen by
    * salted-hash rank — a deterministic uniform subsample of each group.
    * One shuffle on the group key (the standard window top-n). */
  def rebalance(df: DataFrame, group: Column, idCol: Column, cap: Int,
                salt: String = "graft-rebal-v1"): DataFrame = {
    val hk = md5(concat(lit(salt + ":"), idCol.cast("string")))
    graft.ops.Ops.limitBy(df, Seq(group), Seq(hk, idCol), cap, "__rn")
      .drop("__rn")
  }
}
