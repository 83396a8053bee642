package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step of a near-duplicate pipeline (LSH emits PAIRS; turning pairs into
  * duplicate CLUSTERS with one canonical document each is a
  * connected-components problem).
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
  * and Beyond", SoCC 2014) — converges in O(log^2 n) rounds on any graph
  * (duplicate graphs, being near-cliques, converge in 2-3). Each round is
  * expressed as one groupBy (per-node neighborhood min) plus one join —
  * only (node, min) pairs shuffle, never materialized neighborhoods, so a
  * round is O(|E|) shuffle I/O and skew-free even for giant clusters.
  * Reference analog: the duplicate-range collapse inside
  * MergeTreeDataMergerMutator / ReplacingSortedAlgorithm.cpp works per
  * sorted range; at corpus scale the graph formulation is the standard
  * published approach.
  */
object Graphs {

  /** Connected components of the undirected graph given by `edges`
    * (two numeric columns `aCol`, `bCol`). Returns ("id", "component")
    * for every node incident to at least one edge, where component is
    * the minimum node id of the node's component (the component min is
    * its own label too). Deterministic; `maxIter` bounds the star rounds
    * (convergence is checked each round via a canonical-edge checksum).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    def symmetrize(e: DataFrame): DataFrame =
      e.select(col("a"), col("b")).union(e.select(col("b").as("a"), col("a").as("b")))

    /** large-star: every neighbor v > u links to m = min(N(u) ∪ {u}). */
    def largeStar(e: DataFrame): DataFrame = {
      val sym = symmetrize(e)
      val mins = sym.groupBy("a").agg(min("b").as("nmin"))
        .select(col("a").as("u"), least(col("nmin"), col("a")).as("m"))
      sym.where(col("b") > col("a"))
        .join(mins, col("a") === col("u"))
        .select(col("b").as("a"), col("m").as("b"))
        .where(col("a") =!= col("b"))
        .distinct()
    }

    /** small-star: strictly smaller neighbors plus u itself link to the
      * smallest of them. */
    def smallStar(e: DataFrame): DataFrame = {
      val sym = symmetrize(e)
      val smaller = sym.where(col("b") < col("a"))
      val mins = smaller.groupBy("a").agg(min("b").as("m"))
        .select(col("a").as("u"), col("m"))
      val linkSmaller = smaller.join(mins, col("a") === col("u"))
        .select(col("b").as("a"), col("m").as("b"))
      val linkSelf = mins.select(col("u").as("a"), col("m").as("b"))
      linkSmaller.union(linkSelf).where(col("a") =!= col("b")).distinct()
    }

    /** Orientation-free fingerprint of an edge set: (count, hash-xor) —
      * xor, not sum, so the fold cannot overflow under ANSI mode. */
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.select(
        count(lit(1)).as("c"),
        coalesce(expr("bit_xor(xxhash64(greatest(a, b), least(a, b)))"),
          lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    var cur = edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint(false)
    // Sentinel start signature: round 1 computes the input (through its
    // checkpoint) inside its own single job — no separate priming action.
    var sig = (-1L, -1L)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // LAZY localCheckpoint: truncates the logical plan immediately
      // (symmetrize embeds the prior round TWICE, so without truncation
      // plans double every round and Catalyst compile time explodes),
      // while the actual materialization rides the checksum aggregate —
      // exactly ONE job per round.
      val next = smallStar(largeStar(cur)).localCheckpoint(false)
      val nsig = checksum(next)
      cur.unpersist(false)
      cur = next
      converged = nsig == sig
      sig = nsig
      it += 1
    }
    // After convergence the edge set is a forest of stars (child, root).
    val roots = cur.select(col("b").as("id")).distinct()
    cur.select(col("a").as("id"), col("b").as("component"))
      .union(roots.select(col("id"), col("id").as("component")))
      .distinct()
  }

  /** Canonical-document assignment for a whole corpus: every id in `ids`
    * maps to the min id of its duplicate cluster (itself when unpaired). */
  def canonicalAssignment(ids: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    ids.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("canonical"))
  }
}
