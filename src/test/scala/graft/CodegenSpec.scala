package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RollingHash64, SimHash64, VectorKernels}

/** The kernel expressions implement real doGenCode (no CodegenFallback).
  * A broken codegen template would NOT fail normal query tests — Spark
  * silently falls back to interpreted execution when generated code fails
  * to compile — so this spec compiles each kernel's generated projection
  * DIRECTLY (GenerateUnsafeProjection throws on a compile error) and
  * asserts the generated result equals the interpreted eval.
  */
class CodegenSpec extends AnyFunSuite {

  private def darr(xs: Double*): Expression =
    Literal.create(xs, ArrayType(DoubleType, containsNull = false))
  private def farr(xs: Float*): Expression =
    Literal.create(xs, ArrayType(FloatType, containsNull = false))
  private def larr(xs: Long*): Expression =
    Literal.create(xs, ArrayType(LongType, containsNull = false))
  private def sarr(xs: String*): Expression =
    Literal.create(xs, ArrayType(StringType, containsNull = true))

  /** Compile the generated projection (throws on bad codegen), run it,
    * and compare with the interpreted eval. */
  private def generatedEqualsInterpreted(e: Expression): Unit = {
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    val gen = proj(InternalRow.empty).get(0, e.dataType)
    val interp = e.eval(InternalRow.empty)
    (gen, interp) match {
      case (g: ArrayData, i: ArrayData) =>
        assert(g.toLongArray.toSeq == i.toLongArray.toSeq)
      case (g, i) => assert(g == i)
    }
  }

  test("CosineSim generated == interpreted (double and float)") {
    generatedEqualsInterpreted(VectorKernels.CosineSim(darr(1, 2, 3), darr(4, 5, 6)))
    generatedEqualsInterpreted(VectorKernels.CosineSim(farr(1f, 2f), farr(0.5f, -2f)))
  }

  test("DotProduct generated == interpreted") {
    generatedEqualsInterpreted(VectorKernels.DotProduct(darr(1, 2, 3), darr(4, 5, 6)))
  }

  test("JaccardSim (string sets) generated == interpreted") {
    generatedEqualsInterpreted(
      VectorKernels.JaccardSim(sarr("a", "b", "c"), sarr("b", "c", "d")))
  }

  test("MinHashSig generated == interpreted") {
    generatedEqualsInterpreted(VectorKernels.MinHashSig(sarr("the", "quick", "fox"), 16))
  }

  test("MinHashTokensSig generated == interpreted") {
    generatedEqualsInterpreted(
      VectorKernels.MinHashTokensSig(sarr("the", "quick", "brown", "fox", "jumps"), 3, 32))
  }

  test("HyperplaneBandSigs generated == interpreted") {
    generatedEqualsInterpreted(
      VectorKernels.HyperplaneBandSigs(darr(0.3, -0.7, 0.2, 0.9), bands = 4, planesPerBand = 8))
  }

  test("CharNgramHashes generated == interpreted") {
    generatedEqualsInterpreted(
      VectorKernels.CharNgramHashes(Literal("hello world hello"), 5))
  }

  test("JaccardSortedLongs / IntersectCountSortedLongs generated == interpreted") {
    generatedEqualsInterpreted(
      VectorKernels.JaccardSortedLongs(larr(1L, 5L, 9L, 12L), larr(5L, 9L, 30L)))
    generatedEqualsInterpreted(
      VectorKernels.IntersectCountSortedLongs(larr(1L, 5L, 9L, 12L), larr(5L, 9L, 30L)))
  }

  test("SimHash64 / RollingHash64 generated == interpreted") {
    generatedEqualsInterpreted(SimHash64(sarr("near", "duplicate", "text")))
    generatedEqualsInterpreted(RollingHash64(Literal("fingerprint me")))
  }

  test("mismatched vector lengths raise through the generated path too") {
    val proj = GenerateUnsafeProjection.generate(
      Seq(VectorKernels.CosineSim(darr(1, 2, 3), darr(1, 2))))
    intercept[Exception] { proj(InternalRow.empty) }
  }
}
