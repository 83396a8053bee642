package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** 2-D space-filling-curve codecs (reference: src/Functions/mortonEncode.cpp,
  * mortonDecode.cpp, hilbertEncode2DLUT / hilbertDecode2DLUT in
  * src/Functions/hilbertEncode.cpp, hilbertDecode.cpp). These are the
  * locality-preserving sort keys used for multi-column range pruning:
  * writing data ordered by the curve value clusters rows that are close in
  * (x, y), so min/max footer pruning works on BOTH dimensions at once.
  *
  * Pure bit-twiddling — stateless, codegen through the static kernels.
  * Coordinates are masked to `bits` (default 16 each → codes fit in the
  * low 2*bits of a non-negative Long).
  */
case class MortonEncode2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(l: Any, r: Any): Any =
    SpaceCurves.mortonEncodeEval(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SpaceCurves.mortonEncodeEval($a, $b, $bits);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r, bits)
}

/** Inverse of MortonEncode2 — returns array(x, y). */
case class MortonDecode2(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SpaceCurves.mortonDecodeEval(input.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SpaceCurves.mortonDecodeEval($a, $bits);")
  override protected def withNewChildInternal(c: Expression): MortonDecode2 = copy(child = c)
}

case class HilbertEncode2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(l: Any, r: Any): Any =
    SpaceCurves.hilbertEncodeEval(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SpaceCurves.hilbertEncodeEval($a, $b, $bits);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r, bits)
}

/** Inverse of HilbertEncode2 — returns array(x, y). */
case class HilbertDecode2(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SpaceCurves.hilbertDecodeEval(input.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SpaceCurves.hilbertDecodeEval($a, $bits);")
  override protected def withNewChildInternal(c: Expression): HilbertDecode2 = copy(child = c)
}

object SpaceCurves {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Interleave: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  def mortonEncodeEval(x: Long, y: Long, bits: Int): Long = {
    var code = 0L
    var i = 0
    while (i < bits) {
      code |= ((x >>> i) & 1L) << (2 * i)
      code |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    code
  }

  def mortonDecodeEval(code: Long, bits: Int): ArrayData = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((code >>> (2 * i)) & 1L) << i
      y |= ((code >>> (2 * i + 1)) & 1L) << i
      i += 1
    }
    new GenericArrayData(Array(x, y))
  }

  /** Classic xy2d (Hilbert curve, Wikipedia formulation): fold quadrant
    * index + rotate, MSB to LSB. d ∈ [0, 4^bits). */
  def hilbertEncodeEval(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask; var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertDecodeEval(d0: Long, bits: Int): ArrayData = {
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    val n = 1L << bits
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    new GenericArrayData(Array(x, y))
  }

  def mortonEncode(x: Column, y: Column, bits: Int = 16): Column =
    column(MortonEncode2(expression(x.cast("long")), expression(y.cast("long")), bits))

  def mortonDecode(code: Column, bits: Int = 16): Column =
    column(MortonDecode2(expression(code.cast("long")), bits))

  def hilbertEncode(x: Column, y: Column, bits: Int = 16): Column =
    column(HilbertEncode2(expression(x.cast("long")), expression(y.cast("long")), bits))

  def hilbertDecode(code: Column, bits: Int = 16): Column =
    column(HilbertDecode2(expression(code.cast("long")), bits))
}
