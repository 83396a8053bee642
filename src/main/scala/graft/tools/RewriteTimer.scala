package graft.tools

/** Rewrite-only wall-time probe (optimization guide §1: measure first).
  * Times ChSql.rewrite alone — no SparkSession, no execution — over the
  * 43 ClickBench query texts, so dialect front-end overhead is isolated
  * from plan/run time. Prints per-query micros and the suite total. */
object RewriteTimer {
  def main(args: Array[String]): Unit = {
    val qs = graft.queries.ClickBench.sparkTexts
    // warm-up (JIT)
    for (_ <- 1 to 3; q <- qs) graft.sqlfront.ChSql.rewrite(q)
    val n = 5
    val times = qs.zipWithIndex.map { case (q, i) =>
      val t0 = System.nanoTime()
      for (_ <- 1 to n) graft.sqlfront.ChSql.rewrite(q)
      (i, (System.nanoTime() - t0) / 1e3 / n)
    }
    times.foreach { case (i, us) => println(f"q_cb_$i%02d rewrite ${us}%10.1f us") }
    println(f"TOTAL rewrite per suite pass: ${times.map(_._2).sum / 1e3}%8.2f ms")
  }
}
