package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 task: measure the LSH density knob (BASELINE.md claims
  * "bits/bands ~ log n is a parameter choice, not a plan-shape problem" —
  * this converts the claim to numbers). Generates x10 / x100
  * documents+embeddings fixtures from sf0.1 (the ScaleUp permutation /
  * rotation schemes, docs+embeddings only), then runs:
  *   - minhashLshPairs with FIXED default banding (k=32, b=8, r=4) and
  *     with SCALED banding (k=48, b=6, r=8 — longer bands at higher n)
  *   - cosinePairsBucketed with FIXED (12 bands x 8 planes) and SCALED
  *     (24 bands x ~log2(n) planes)
  * at both scales, reporting candidate-pair counts (threshold-0 run) and
  * verified-pair wall time. Sole-JVM discipline applies (bench-style). */
object LshDensitySweep {
  /** Build the sf1/sf10 LSH fixtures from sf0.1 (idempotent) — shared
    * with LshDensityAuto. */
  def buildFixtures(spark: org.apache.spark.sql.SparkSession): Unit = {
    val src = "/root/testdata/sf0.1"
    def fixture(out: String, copies: Int): Unit = {
      if (new java.io.File(s"$out/documents.parquet").exists()) return
      def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
      val copyIdx = spark.range(copies).select(col("id").cast("int").as("__c"))
      def rep(t: String) = rd(t).crossJoin(broadcast(copyIdx))
      def shift(c: String, span: Long) = (col(c) + col("__c") * span).as(c)
      // per-copy token permutation (see ScaleUp.scala: rotation would make
      // every doc a copies-clique of near-dups; permutation preserves the
      // token multiset while decorrelating shingles)
      val toks = split(col("text"), " ")
      val permuted = transform(
        array_sort(zip_with(toks, sequence(lit(1), size(toks)),
          (t, i) => struct(xxhash64(t, i, col("__c")).as("h"), t.as("t")))),
        s => s.getField("t"))
      rep("documents").select(shift("doc_id", 100000L),
        when(col("__c") === 0, col("text"))
          .otherwise(array_join(permuted, " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      // rotation + sign flip once the rotation wraps (dim=64 < 100 copies)
      val dim = size(col("embedding"))
      val r = pmod(col("__c"), greatest(dim, lit(1)))
      val rotVec = concat(slice(col("embedding"), r + 1, dim - r),
        slice(col("embedding"), lit(1), r))
      val flipped = when(pmod(floor(col("__c") / dim), lit(2)) === 1,
        transform(rotVec, x => -x)).otherwise(rotVec)
      rep("embeddings").select(shift("vec_id", 100000L),
        when(col("__c") === 0, col("embedding")).otherwise(flipped).as("embedding"),
        col("label"))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(s"[lsh-sweep] fixture $out x$copies written")
    }
    fixture("/tmp/lsh_sf1", 10)
    fixture("/tmp/lsh_sf10", 100)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def med(body: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }

    buildFixtures(spark)

    println(f"${"scale"}%-6s ${"op"}%-22s ${"params"}%-18s ${"cand"}%10s ${"pairs"}%8s ${"sec"}%8s")
    for ((label, dir) <- Seq("sf1" -> "/tmp/lsh_sf1", "sf10" -> "/tmp/lsh_sf10")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val variants = Seq(
        ("minhash-fixed", 32, 8),   // 4 rows/band — the sf0.1 default
        ("minhash-scaled", 48, 6))  // 8 rows/band — log-n longer bands
      for ((nm, k, b) <- variants) {
        val (candSec, cand) = med(graft.llm.Dedup.minhashLshPairs(
          docs, "doc_id", "text", k = k, bands = b, threshold = 0.0).count())
        val (sec, pairs) = med(graft.llm.Dedup.minhashLshPairs(
          docs, "doc_id", "text", k = k, bands = b, threshold = 0.7).count())
        println(f"$label%-6s $nm%-22s k=$k b=$b           $cand%10d $pairs%8d ${sec + candSec}%8.2f  (cand-run ${candSec}%.2f s + verify-run ${sec}%.2f s)")
      }
      val n = emb.count()
      val logPlanes = math.ceil(math.log(n.toDouble) / math.log(2)).toInt
      val evariants = Seq(
        ("cosine-fixed", 12, 8),
        ("cosine-scaled", 24, logPlanes))
      for ((nm, b, p) <- evariants) {
        val (candSec, cand) = med(graft.llm.Similarity.cosinePairsBucketed(
          emb, "vec_id", "embedding", threshold = -1.0, bands = b,
          planesPerBand = p).count())
        val (sec, pairs) = med(graft.llm.Similarity.cosinePairsBucketed(
          emb, "vec_id", "embedding", threshold = 0.9, bands = b,
          planesPerBand = p).count())
        println(f"$label%-6s $nm%-22s b=$b p=$p           $cand%10d $pairs%8d ${sec + candSec}%8.2f  (cand-run ${candSec}%.2f s + verify-run ${sec}%.2f s)")
      }
    }
    spark.stop()
  }
}
