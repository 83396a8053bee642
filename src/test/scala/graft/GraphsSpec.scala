package graft

import graft.llm.Similarity
import graft.ops.Graphs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (large-star/small-star) and the clustering ops
  * built on it. */
class GraphsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique, pair, and a 40-node path all collapse to their min") {
    val path = (100L until 140L).sliding(2).map(s => (s(0), s(1))).toSeq
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain
      (10L, 11L), (11L, 12L), (10L, 12L),          // triangle
      (20L, 21L)) ++ path
    val got = cc(edges)
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert((100L until 140L).forall(got(_) == 100L))
  }

  test("edge order / orientation does not change the result") {
    val e1 = Seq((5L, 9L), (9L, 2L), (7L, 5L))
    val e2 = e1.reverse.map(_.swap)
    assert(cc(e1) == cc(e2))
    assert(cc(e1).values.toSet == Set(2L))
  }

  test("canonicalAssignment maps unpaired ids to themselves") {
    val ids = (0L until 10L).toDF("id")
    val pairs = Seq((1L, 3L), (3L, 7L)).toDF("a", "b")
    val got = Graphs.canonicalAssignment(ids, "id", pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(3L) == 1L && got(7L) == 1L)
    assert((Set(0L, 2L, 4L, 5L, 6L, 8L, 9L)).forall(i => got(i) == i))
  }

  test("kmeansFit is deterministic and Lloyd iterations do not increase inertia") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c0 = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 0)
    val c2 = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val c2b = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 2)
    assert(c2.map(_._1) == c2b.map(_._1) &&
      c2.zip(c2b).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    val i0 = Similarity.kmeansInertia(emb, "embedding", c0)
    val i2 = Similarity.kmeansInertia(emb, "embedding", c2)
    assert(i2 <= i0 + 1e-9, s"inertia rose: $i0 -> $i2")
  }

  test("semanticDedup keeps exactly the minimal representative per near-dup group") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seeds = Similarity.collectSeeds(emb, "vec_id", "embedding", col("vec_id") < 4)
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", seeds, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // every cell's lowest id is always kept
    out.groupBy(_._2).foreach { case (_, rows) =>
      val minId = rows.map(_._1).min
      assert(rows.find(_._1 == minId).get._3, s"cell min $minId must be kept")
    }
    // at least one duplicate exists at this permissive threshold
    assert(out.exists(!_._3))
  }
}
