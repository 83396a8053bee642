package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Query result cache (reference: src/Interpreters/Cache/QueryCache.h —
  * results keyed by the normalized query AST, transparently reused by
  * identical later queries). Spark-native formulation: key = the
  * CANONICALIZED analyzed Catalyst plan (alias/case/ordering-insensitive,
  * same normalization role as the reference's AST hash), value = the
  * persisted DataFrame. A hit returns the already-persisted frame, so
  * re-execution becomes an InMemoryTableScan instead of a recompute;
  * collisions are impossible because hash buckets are confirmed with
  * Catalyst's sameResult before reuse.
  *
  * Scale note: persist() is cluster-wide (executor block manager, spills
  * to disk), so this is the same machinery a 1000-executor cluster would
  * use — nothing driver-local except the key map.
  */
object QueryCache {

  private case class Entry(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                           df: DataFrame)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, List[Entry]]()

  private def key(df: DataFrame) = df.queryExecution.analyzed.canonicalized

  /** Return the cached equivalent of `df`, persisting it on first use. */
  def cached(df: DataFrame,
             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = key(df)
    val h = p.semanticHash()
    cache.synchronized {
      val bucket = cache.getOrDefault(h, Nil)
      bucket.find(_.plan.sameResult(p)) match {
        case Some(e) => e.df
        case None =>
          df.persist(level)
          cache.put(h, Entry(p, df) :: bucket)
          df
      }
    }
  }

  /** True if an equivalent query is already cached (no side effects). */
  def contains(df: DataFrame): Boolean = {
    val p = key(df)
    cache.getOrDefault(p.semanticHash(), Nil).exists(_.plan.sameResult(p))
  }

  /** Drop everything (unpersist all cached results). */
  def clear(): Unit = cache.synchronized {
    cache.values.forEach(_.foreach(_.df.unpersist()))
    cache.clear()
  }

  def size: Int = {
    var n = 0
    cache.values.forEach(l => n += l.size)
    n
  }
}
