package graft.tools

/** Finisher for LshDensitySweep when the sf10 cosine-FIXED variant is
  * aborted (its quadratic in-bucket candidate blowup IS the measurement):
  * runs only the SCALED cosine banding at sf10 so the comparison table
  * has its fourth cell. Sole-JVM discipline applies. */
object LshDensityTail {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/tmp/lsh_sf10/embeddings.parquet")
    val n = emb.count()
    val logPlanes = math.ceil(math.log(n.toDouble) / math.log(2)).toInt
    def med(body: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val c = body
        ((System.nanoTime() - t0) / 1e9, c)
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }
    val (candSec, cand) = med(graft.llm.Similarity.cosinePairsBucketed(
      emb, "vec_id", "embedding", threshold = -1.0, bands = 24,
      planesPerBand = logPlanes).count())
    val (sec, pairs) = med(graft.llm.Similarity.cosinePairsBucketed(
      emb, "vec_id", "embedding", threshold = 0.9, bands = 24,
      planesPerBand = logPlanes).count())
    println(f"sf10   cosine-scaled          b=24 p=$logPlanes           $cand%10d $pairs%8d ${sec + candSec}%8.2f  (cand-run ${candSec}%.2f s + verify-run ${sec}%.2f s)")
    spark.stop()
  }
}
