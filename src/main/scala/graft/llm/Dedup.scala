package graft.llm

import graft.functions.TextHashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora (reference similarity and
  * dedup family: FunctionsStringHash.cpp minHash/wordShingle variants —
  * re-expressed as declarative Spark plans that scale by shuffling only
  * ids + band hashes, never full text, between stages).
  */
object Dedup {

  /** Distinct word n-gram shingles of `text`. Rows with fewer than n
    * tokens produce an empty array (callers filter if needed). */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array(array_join(toks, " ")))
  }

  /** Distinct character n-grams. */
  def charShingles(text: Column, n: Int = 8): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => substring(text, lit(i), lit(n)))))
      .otherwise(array(text))

  /** k-permutation MinHash signature of a shingle array: element i is
    * min over shingles of hash_i(shingle), hash_i = xxhash64 seeded by i.
    * Pure built-ins — stays in codegen, no UDF. */
  def minhashSignature(shingles: Column, k: Int = 32): Column =
    array((0 until k).map(i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))): _*)

  /** Exact Jaccard between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash + LSH near-duplicate pairs.
    *
    * Plan shape (the 100 TB story):
    *  1. per-doc shingle set + k-hash MinHash signature (map-only)
    *  2. signature sliced into `bands` bands of k/bands rows; each band
    *     hashed -> (bandIdx, bandHash, id) — the ONLY thing shuffled
    *  3. self-join on (bandIdx, bandHash) -> candidate id pairs (distinct)
    *  4. candidates re-joined to shingle sets, exact Jaccard verification
    *
    * With j >= 0.9 near-dups, k=32/bands=8 gives detection probability
    * 1-(1-0.9^4)^8 ≈ 1-3e-8 per pair; candidates are verified exactly so
    * false positives never escape.
    *
    * Returns (a, b, jaccard) with a < b, jaccard >= threshold.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                      threshold: Double = 0.7): DataFrame = {
    val rows = k / bands
    val sh = docs.select(col(idCol).as("id"), wordShingles(col(textCol), shingleN).as("g"))
    val sig = sh.select(col("id"), minhashSignature(col("g"), k).as("sig"))
    val bandRows = sig.select(col("id"), explode(array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*).as("bh"))): _*)).as("s"))
      .select(col("id"), col("s.band"), col("s.bh"))
    val cand = bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    cand
      .join(sh.select(col("id").as("a"), col("g").as("ga")), "a")
      .join(sh.select(col("id").as("b"), col("g").as("gb")), "b")
      .select(col("a"), col("b"), jaccard(col("ga"), col("gb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact all-pairs n-gram Jaccard (quadratic — for bounded subsets or
    * verification; the LSH path above is the scale path). */
  def exactJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingles: Column => Column,
                        threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol)).as("g"))
    sh.as("x").join(sh.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        jaccard(col("x.g"), col("y.g")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-duplicate pairs: 64-bit fingerprints, candidates from
    * 4×16-bit band buckets (hamming ≤ 3 ⇒ some band matches exactly),
    * verified by hamming distance. Same shuffle-only-ids shape as MinHash. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = docs.select(col(idCol).as("id"),
      TextHashes.sim_hash64(split(col(textCol), " ")).as("h"))
    val bandRows = fp.select(col("id"), col("h"), explode(array((0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("h"), b * 16).bitwiseAND(0xffffL).as("bh"))): _*)).as("s"))
      .select(col("id"), col("h"), col("s.band"), col("s.bh"))
    bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        TextHashes.hamming64(col("x.h"), col("y.h")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact duplicate groups by full-text hash (the trivial-but-essential
    * first pass of any corpus dedup). */
  def exactDupStats(docs: DataFrame, textCol: String): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("copies"))
      .groupBy().agg(
        count(lit(1)).as("n_distinct"),
        sum(col("copies")).as("n_docs"),
        sum(when(col("copies") > 1, col("copies") - 1).otherwise(0L)).as("n_redundant"))
}
