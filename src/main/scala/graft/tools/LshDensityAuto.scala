package graft.tools

import org.apache.spark.sql.functions._

/** Zero-parameter confirmation of the corpus-size-derived LSH banding
  * (llm/LshDefaults): runs the minhash and cosine near-dup operators at
  * sf1 / sf10 with NO banding arguments — exactly what a user gets by
  * default — and prints the banding the derivation chose plus candidate
  * counts and wall time. Closes the r12→r13 loop: the measured
  * scale-safe settings are not just spec-pinned, they are what actually
  * FIRES at scale. Reuses LshDensitySweep's fixtures (/tmp/lsh_sf1,
  * /tmp/lsh_sf10 — built from sf0.1 on first use). */
object LshDensityAuto {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def t1[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    LshDensitySweep.buildFixtures(spark)
    println(f"${"scale"}%-6s ${"op"}%-16s ${"derived"}%-18s ${"pairs"}%10s ${"sec"}%8s")
    for ((label, dir) <- Seq("sf1" -> "/tmp/lsh_sf1", "sf10" -> "/tmp/lsh_sf10")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nDocs = docs.count(); val nEmb = emb.count()
      val (mk, mb) = graft.llm.LshDefaults.minhash(nDocs)
      val (cb, cp) = graft.llm.LshDefaults.cosine(nEmb)
      val (msec, mpairs) = t1(graft.llm.Dedup.minhashLshPairs(
        docs, "doc_id", "text", threshold = 0.7, nHint = nDocs).count())
      println(f"$label%-6s ${"minhash-auto"}%-16s k=$mk b=$mb (n=$nDocs)   $mpairs%10d $msec%8.2f")
      val (csec, cpairs) = t1(graft.llm.Similarity.cosinePairsBucketed(
        emb, "vec_id", "embedding", threshold = 0.9, nHint = nEmb).count())
      println(f"$label%-6s ${"cosine-auto"}%-16s b=$cb p=$cp (n=$nEmb)   $cpairs%10d $csec%8.2f")
    }
    spark.stop()
  }
}
