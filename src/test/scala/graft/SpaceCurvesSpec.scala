package graft

import graft.functions.{IntMath, SpaceCurves}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpaceCurvesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("gcd/lcm golden values and edge cases") {
    assert(IntMath.gcdEval(12, 18) == 6)
    assert(IntMath.gcdEval(0, 0) == 0)
    assert(IntMath.gcdEval(-12, 18) == 6)
    assert(IntMath.gcdEval(17, 5) == 1)
    assert(IntMath.lcmEval(4, 6) == 12)
    assert(IntMath.lcmEval(0, 5) == 0)
    assert(IntMath.lcmEval(-4, 6) == 12)
  }

  test("gcd/lcm as column expressions (codegen path)") {
    import spark.implicits._
    val out = Seq((12L, 18L), (7L, 13L), (0L, 9L)).toDF("a", "b")
      .select(IntMath.gcd(col("a"), col("b")).as("g"),
        IntMath.lcm(col("a"), col("b")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((6L, 36L), (1L, 91L), (9L, 0L)))
  }

  test("morton encode golden + roundtrip") {
    // interleave: x bits on even positions, y bits on odd
    assert(SpaceCurves.mortonEncodeEval(5, 3, 16) == 27)
    assert(SpaceCurves.mortonEncodeEval(0, 0, 16) == 0)
    // x = all ones -> even bits set
    assert(SpaceCurves.mortonEncodeEval(65535, 0, 16) == 0x55555555L)
    assert(SpaceCurves.mortonEncodeEval(0, 65535, 16) == 0xAAAAAAAAL)
    for ((x, y) <- Seq((0L, 0L), (1L, 2L), (123L, 456L), (65535L, 65535L))) {
      val d = SpaceCurves.mortonDecodeEval(SpaceCurves.mortonEncodeEval(x, y, 16), 16)
      assert(d.getLong(0) == x && d.getLong(1) == y)
    }
  }

  test("hilbert 2x2 and 4x4 golden curve order + roundtrip") {
    // bits=1 (2x2 grid): the base U-shape visits (0,0) (0,1) (1,1) (1,0)
    val order1 = (0L to 3L).map { d =>
      val a = SpaceCurves.hilbertDecodeEval(d, 1); (a.getLong(0), a.getLong(1))
    }
    assert(order1 == Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)))
    // encode is the inverse
    for ((x, y) <- order1) {
      val d = SpaceCurves.hilbertEncodeEval(x, y, 1)
      assert(order1(d.toInt) == ((x, y)))
    }
    // bits=2: consecutive d values are always grid neighbours (the
    // locality property that makes it a good sort key)
    val pts = (0L until 16L).map { d =>
      val a = SpaceCurves.hilbertDecodeEval(d, 2); (a.getLong(0), a.getLong(1))
    }
    pts.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent hilbert step ($x1,$y1)->($x2,$y2)")
    }
    // full roundtrip at 16 bits
    for ((x, y) <- Seq((0L, 0L), (1L, 2L), (40000L, 123L), (65535L, 65535L))) {
      val a = SpaceCurves.hilbertDecodeEval(SpaceCurves.hilbertEncodeEval(x, y, 16), 16)
      assert(a.getLong(0) == x && a.getLong(1) == y)
    }
  }

  test("executable UDF pipes a column through an external process") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"name_$i")).toDF("id", "s")
      .repartition(4)
    val out = graft.ops.ExecutableUdf.pipeColumn(
      df, "s", "u", Seq("tr", "[:lower:]", "[:upper:]"))
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getAs[String]("u") == r.getAs[String]("s").toUpperCase))
  }

  test("executable UDF propagates process failure") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s")
    val ex = intercept[org.apache.spark.SparkException] {
      graft.ops.ExecutableUdf.pipeColumn(df, "s", "u", Seq("false")).collect()
    }
    assert(ex.getMessage != null)
  }
}
