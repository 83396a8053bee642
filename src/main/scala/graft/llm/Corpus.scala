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

  /** Boilerplate detection, CCNet-flavored (Wenzek et al., "CCNet:
    * Extracting high quality monolingual datasets from web crawl data" —
    * shared-shingle filtering): a token trigram occurring in more than
    * `docFrac` of all documents is boilerplate; a document whose distinct
    * trigrams are mostly boilerplate is template/chrome content and gets
    * dropped.
    *
    * Shape: map-side trigram explode → distinct (doc, trigram) → trigram
    * document-frequency (map-side combinable) → join hits back → per-doc
    * fraction. The corpus-wide doc count is a 1-row broadcast. Returns
    * (doc_id, n_tri, n_freq, frac_ppm, kept) — integer/ppm outputs so the
    * result is engine-exact. */
  def boilerplateStats(docs: DataFrame, idCol: Column, tokensCol: Column,
                       docFrac: Double = 0.3,
                       keepBelowPpm: Long = 800000L): DataFrame = {
    val base = docs.select(idCol.as("doc_id"), tokensCol.as("toks"))
      .filter(size(col("toks")) >= 3)
    // trigram construction through the TokenNgrams codegen kernel — the
    // transform(sequence, i -> concat_ws(...)) composition runs an
    // interpreted lambda per position (HigherOrderFunction =
    // CodegenFallback) and dominated this query's profile
    val tri = base.select(col("doc_id"),
        explode(graft.functions.TextHashes.token_ngrams(col("toks"), 3)).as("tri"))
      .distinct()
    val nDocs = base.select(count(lit(1)).as("n_docs"))
    // per-trigram document frequency as a whole-partition window over
    // `tri` instead of groupBy(tri) + join-back: the corpus-sized
    // relation crosses the network ONCE by trigram (the window's
    // exchange) rather than twice (aggregate exchange + join exchange),
    // and the trigram-vocabulary side table disappears entirely — it
    // was planner-broadcast at bench scale but is corpus-vocabulary-
    // sized (unbroadcastable) at 100 TB (r18 plan audit: 16 -> 10
    // exchanges, 2 scans of `tri` -> 1).
    val wTri = org.apache.spark.sql.expressions.Window.partitionBy(col("tri"))
    tri.withColumn("df", count(lit(1)).over(wTri))
      .crossJoin(broadcast(nDocs))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("df") > col("n_docs") * docFrac, 1L).otherwise(0L))
          .as("n_freq"))
      .withColumn("frac_ppm",
        floor(lit(1000000L) * col("n_freq") / col("n_tri")).cast("long"))
      .withColumn("kept", col("frac_ppm") <= keepBelowPpm)
  }

  /** Corpus vocabulary coverage: token frequencies ranked by count, with
    * the cumulative share of all token occurrences each vocabulary prefix
    * covers (the curve a BPE/vocab-size decision reads). The running
    * total uses the two-phase keyed formulation (no global single-
    * partition window): the monotone bucket is the negated count, so
    * partial sums compose per count-band. */
  def vocabCoverage(docs: DataFrame, tokensCol: Column, topK: Int): DataFrame = {
    val freq = docs.select(explode(tokensCol).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val ord = struct((-col("cnt")).as("nc"), col("tok").as("t"))
    val bucket = Some(-col("cnt"))
    val withCum = graft.ops.Ops.keyedRunningTotal(
      freq, Seq(lit(0)), ord, col("cnt"), "cum_cnt", bucket = bucket)
    val withRank = graft.ops.Ops.keyedRunningTotal(
      withCum, Seq(lit(0)), ord, lit(1L), "rnk", bucket = bucket)
    val total = freq.select(sum(col("cnt")).as("total_cnt"))
    withRank.filter(col("rnk") <= topK)
      .crossJoin(broadcast(total))
      .select(col("rnk").cast("long"), col("tok"), col("cnt"),
        col("cum_cnt").cast("long"),
        floor(lit(1000000L) * col("cum_cnt") / col("total_cnt"))
          .cast("long").as("covered_ppm"))
  }

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

  /** Perplexity-proxy quality score (the CCNet/KenLM filter shape,
    * Wenzek et al. 2020): train a token-bigram LM on the corpus itself,
    * score each document by its mean bigram log-probability
    * ln c(w1,w2)/c(w1). Low scores = improbable token sequences =
    * gibberish/boilerplate candidates. Two groupBys build the model
    * (observed bigrams only — O(corpus tokens), never vocab²); scoring
    * is one join from a doc's bigrams to the model. Self-trained, so
    * every bigram is observed (no smoothing needed) and the whole thing
    * is deterministic and engine-exact up to the final mean. */
  def bigramLogProb(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    // bigrams through the TokenNgrams codegen kernel (space-joined, then
    // split at the single separator — tokens are space-free by
    // construction); the per-position struct lambda was interpreted
    val grams = graft.functions.TextHashes.token_ngrams(split(textCol, " "), 2)
    val pairs = docs.select(idCol.as("id"), explode(grams).as("g"))
      .select(col("id"), substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
    // ONE pass over the exploded pairs: per-doc bigram multiplicities.
    // Bigram totals roll up from that, unigram totals roll up from the
    // bigram totals (c1 = Σ_w2 c12) — the raw pairs are never re-scanned.
    // No .persist(): the two consumers share the identical aggregate
    // subtree, which physical planning dedupes via ReuseExchange — and a
    // persist here registered the plan in the session CacheManager, so
    // every later identical invocation silently read the FIRST run's
    // materialization (cross-pass result reuse the bench must not see)
    // and the entry was never unpersisted (unbounded executor memory
    // growth over a long session).
    val pairAgg = pairs.groupBy("id", "w1", "w2").agg(count(lit(1)).as("m"))
    val bi = pairAgg.groupBy("w1", "w2").agg(sum("m").as("c12"))
    val uni = bi.groupBy("w1").agg(sum("c12").as("c1"))
    val model = bi.join(uni, "w1")
      .select(col("w1"), col("w2"), log(col("c12").cast("double") / col("c1")).as("lp"))
    pairAgg.join(model, Seq("w1", "w2"))
      .groupBy("id")
      .agg(round(sum(col("m") * col("lp")) / sum(col("m")), 6).as("avg_logp"),
        sum(col("m")).as("n_pairs"))
  }

  /** Data-mixture planning: apportion an integer token `budget` across
    * groups proportionally to their weights, with the largest-remainder
    * (Hamilton) method — allocations are integers, sum EXACTLY to the
    * budget, and the rounding is deterministic (remainder desc, key asc).
    * All arithmetic is exact fixed-point (DECIMAL(38,0)), so results are
    * engine-independent. The distributed phase is the per-group weight
    * aggregation over the corpus; apportionment itself runs on the tiny
    * per-group table (one row per source/language — driver-scale by
    * construction, like an IVF codebook). */
  def apportionBudget(docs: DataFrame, group: Column, weight: Column,
                      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = docs.groupBy(group.as("grp"))
      .agg(sum(weight.cast("decimal(38,0)")).as("w"))
    val tot = w.agg(sum(col("w")).cast("decimal(38,0)").as("tw"))
    val b = lit(budget).cast("decimal(38,0)")
    val scored = w.crossJoin(broadcast(tot))
      .withColumn("base", floor((b * col("w")) / col("tw")).cast("decimal(38,0)"))
      .withColumn("rem", b * col("w") - col("base") * col("tw"))
    // tiny table: the global window is over one row per group
    val win = Window.orderBy(col("rem").desc, col("grp"))
    val winAll = Window.partitionBy(lit(1))
    scored
      .withColumn("rk", row_number().over(win))
      .withColumn("leftover", (b - sum(col("base")).over(winAll)).cast("long"))
      .select(col("grp"), col("w").cast("long").as("w"),
        (col("base").cast("long") +
          when(col("rk") <= col("leftover"), 1L).otherwise(0L)).as("alloc"))
  }
}
