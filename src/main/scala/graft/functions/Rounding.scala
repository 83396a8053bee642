package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BRound, Cast, Expression, If, LessThan, Literal, Round, RoundCeil, RoundFloor, RuntimeReplaceable, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** ClickHouse rounding family (reference src/Functions/FunctionsRound.h).
  *
  * The reference contract, replicated here exactly:
  *  - Result type = argument type (Spark's floor/ceil return LONG and its
  *    round(double, n) goes through decimal-exact BigDecimal — both
  *    diverge from the reference).
  *  - Floats (FunctionsRound.h:315 FloatRoundingComputation): positive
  *    scale multiplies by 10^N, applies the hardware rounding mode, then
  *    divides; negative scale divides first, multiplies after. All in the
  *    ARGUMENT's precision (Float32 stays single-precision end-to-end).
  *    `round` ties break to EVEN (nearbyint / _mm_round_*, see the header
  *    comment at FunctionsRound.h:44 "banker's rounding for floating
  *    point numbers") — so round(2.5)=2 and, because the scaling happens
  *    in binary FP, round(2.675, 2)=2.67 (2.675*100 = 267.49999...).
  *    Spark's BRound would give 2.68 via exact decimal representation.
  *  - Integers (FunctionsRound.h:110 IntegerRoundingComputation): scale
  *    >= 0 is the identity; negative scale uses exact integer arithmetic
  *    with C-style truncating division, `round` ties away from zero
  *    (TieBreakingMode::Auto) and `roundBankers` ties to even. A scale
  *    exceeding the type's max yields 0 (FunctionsRound.h:178).
  *  - Decimals: half-away-from-zero for `round` (Spark's Round), half-to-
  *    even for `roundBankers` (BRound), RoundFloor/RoundCeil for the
  *    directional modes.
  */
object ChRoundUtil {
  final val ROUND = 0
  final val FLOOR = 1
  final val CEIL = 2
  final val TRUNC = 3

  def applyModeD(x: Double, mode: Int): Double = mode match {
    case ROUND => Math.rint(x)
    case FLOOR => Math.floor(x)
    case CEIL => Math.ceil(x)
    case _ => if (x < 0) Math.ceil(x) else Math.floor(x)
  }

  private def pow10d(n: Int): Double = Math.pow(10.0, n.toDouble)

  def roundD(x: Double, n: Int, mode: Int): Double =
    if (n == 0) applyModeD(x, mode)
    else if (n > 0) { val s = pow10d(n); applyModeD(x * s, mode) / s }
    else { val s = pow10d(-n); applyModeD(x / s, mode) * s }

  /** Float32 path: the multiply/divide happen in SINGLE precision like
    * the reference's Float32 specialization. applyModeD on the widened
    * double is exact (the double represents the float exactly and the
    * integral result converts back without rounding). */
  def roundF(x: Float, n: Int, mode: Int): Float =
    if (n == 0) applyModeD(x.toDouble, mode).toFloat
    else if (n > 0) {
      val s = pow10d(n).toFloat
      applyModeD((x * s).toDouble, mode).toFloat / s
    } else {
      val s = pow10d(-n).toFloat
      applyModeD((x / s).toDouble, mode).toFloat * s
    }

  /** Integer negative-scale rounding — IntegerRoundingComputation
    * computeImpl verbatim (Java / truncates toward zero like C++; wrap on
    * overflow is the reference's declared behavior). */
  def roundL(x: Long, scale: Long, mode: Int, bankers: Boolean): Long = mode match {
    case TRUNC => x / scale * scale
    case FLOOR => (if (x < 0) x - (scale - 1) else x) / scale * scale
    case CEIL => (if (x >= 0) x + (scale - 1) else x) / scale * scale
    case _ =>
      val y = if (x < 0) x - scale else x
      if (!bankers) (y + scale / 2) / scale * scale
      else {
        val q = (y + scale / 2) / scale
        if (q * scale == y + scale / 2)
          ((q + (if (y < 0) 1L else 0L)) & ~1L) * scale
        else q * scale
      }
  }
}

case class ChFloatRound(child: Expression, scale: Int, mode: Int)
    extends UnaryExpression {
  override def dataType: DataType = child.dataType
  private def isFloat = child.dataType == FloatType
  override def nullSafeEval(input: Any): Any =
    if (isFloat) ChRoundUtil.roundF(input.asInstanceOf[Float], scale, mode)
    else ChRoundUtil.roundD(input.asInstanceOf[Double], scale, mode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "roundF" else "roundD"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ChRoundUtil.$fn($a, $scale, $mode);")
  }
  override protected def withNewChildInternal(c: Expression): ChFloatRound =
    copy(child = c)
}

case class ChIntRound(child: Expression, scale10: Long, mode: Int, bankers: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ChRoundUtil.roundL(input.asInstanceOf[Long], scale10, mode, bankers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ChRoundUtil.roundL($a, ${scale10}L, $mode, $bankers);")
  override protected def withNewChildInternal(c: Expression): ChIntRound =
    copy(child = c)
}

/** Type dispatch for round/roundBankers/floor/ceil/trunc — resolves after
  * analysis so the dialect front-end can stay polymorphic. */
case class ChRoundDispatch(child: Expression, scale: Int, mode: Int, bankers: Boolean)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  import ChRoundUtil._
  override lazy val replacement: Expression = child.dataType match {
    case DoubleType | FloatType => ChFloatRound(child, scale, mode)
    case _: DecimalType =>
      val s = Literal(scale)
      mode match {
        case ROUND => if (bankers) BRound(child, s) else Round(child, s)
        case FLOOR => RoundFloor(child, s)
        case CEIL => RoundCeil(child, s)
        case _ =>
          If(LessThan(child, Cast(Literal(0), child.dataType)),
            RoundCeil(child, s), RoundFloor(child, s))
      }
    case t @ (ByteType | ShortType | IntegerType | LongType) =>
      if (scale >= 0) child
      else {
        val typeMax: Long = t match {
          case ByteType => Byte.MaxValue.toLong
          case ShortType => Short.MaxValue.toLong
          case IntegerType => Int.MaxValue.toLong
          case _ => Long.MaxValue
        }
        // reference guard (FunctionsRound.h:178): scale wider than the
        // type -> 0; scales beyond 10^18 overflow size_t there (UB) and
        // are pinned to 0 here for determinism
        if (-scale > 18 || (-scale < 19 && math.pow(10.0, -scale) > typeMax.toDouble))
          Cast(Literal(0L), t)
        else {
          val s10 = { var s = 1L; var i = 0; while (i < -scale) { s *= 10; i += 1 }; s }
          Cast(ChIntRound(Cast(child, LongType), s10, mode, bankers), t)
        }
      }
    case NullType => Literal(null, NullType)
    case _ => ChFloatRound(Cast(child, DoubleType), scale, mode)
  }
  override protected def withNewChildInternal(c: Expression): ChRoundDispatch =
    copy(child = c)
}
