package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer arithmetic tail (reference: src/Functions/gcd.cpp,
  * src/Functions/lcm.cpp — both instantiate GCDLCMImpl.h). Stateless
  * scalar kernels with codegen via the static entry points, so they stay
  * inside whole-stage codegen like any built-in.
  *
  * Semantics (matching DuckDB's gcd/lcm, which the oracle uses):
  * results are non-negative; gcd(0, 0) = 0; lcm(x, 0) = 0. Overflow on
  * lcm follows two's-complement wrap (inputs in the fixtures are small).
  */
case class Gcd(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(l: Any, r: Any): Any =
    IntMath.gcdEval(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntMath.gcdEval($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** byteSwap (reference src/Functions/byteSwap.cpp): reverse the byte
  * order of the 64-bit value — codegen'd straight to the JDK intrinsic. */
case class ByteSwap(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.reverseBytes(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = java.lang.Long.reverseBytes($a);")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class Lcm(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(l: Any, r: Any): Any =
    IntMath.lcmEval(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntMath.lcmEval($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

object IntMath {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Euclid on magnitudes; result is always >= 0. */
  def gcdEval(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcmEval(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) return 0L
    val g = gcdEval(a, b)
    math.abs(a / g * b)
  }

  def gcd(a: Column, b: Column): Column =
    column(Gcd(expression(a.cast("long")), expression(b.cast("long"))))

  def lcm(a: Column, b: Column): Column =
    column(Lcm(expression(a.cast("long")), expression(b.cast("long"))))

  def byteSwap(a: Column): Column =
    column(ByteSwap(expression(a.cast("long"))))
}
