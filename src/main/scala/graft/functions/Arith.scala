package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Abs, Add, Cast, DateAdd, DateDiff, DateSub, EvalMode, Expression, Multiply, RuntimeReplaceable, Subtract, UnaryMinus}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** ClickHouse binary arithmetic type promotion (reference
  * src/Functions/plus.cpp / minus.cpp / multiply.cpp via
  * src/Core/AccurateComparison.h + base/base/NumberTraits:
  * ResultOfAdditionMultiplication/ResultOfSubtraction promote to the
  * NEXT WIDER type — Int8+Int8 -> Int16, Int32+Int32 -> Int64 — so
  * 32-bit arithmetic cannot overflow; only 64-bit wraps). Spark with
  * ANSI on (the 4.x default) instead THROWS on int overflow and
  * `try_add` returns NULL — both wrong for the dialect. Booleans take
  * part as UInt8 like the reference's comparison results. Date arms
  * (FunctionDateOrDateTimeAddInterval): date + int = days forward,
  * date - date = Int32 day difference. Non-integral operands (floats,
  * decimals, intervals) keep Spark's TRY arithmetic: float math never
  * errors, and NULL-on-decimal-overflow is the documented divergence
  * from the reference's throw. */
case class ChArith(left: Expression, right: Expression, op: Int)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  import ChArith._

  private def bits(t: DataType): Int = t match {
    case BooleanType | ByteType => 8
    case ShortType => 16
    case IntegerType => 32
    case _ => 64
  }
  private def integral(t: DataType): Boolean = t match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def wider(b: Int): DataType = b match {
    case 8 => ShortType
    case 16 => IntegerType
    case _ => LongType
  }

  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (DateType, r) if integral(r) && op == PLUS => DateAdd(left, right)
    case (l, DateType) if integral(l) && op == PLUS => DateAdd(right, left)
    case (DateType, r) if integral(r) && op == MINUS => DateSub(left, right)
    case (DateType, DateType) if op == MINUS => DateDiff(left, right)
    case (l, r) if integral(l) && integral(r) =>
      val t = wider(bits(l) max bits(r))
      val (a, b) = (Cast(left, t), Cast(right, t))
      // LEGACY wraps at 64 bits like the reference's Int64 arithmetic
      op match {
        case PLUS => Add(a, b, EvalMode.LEGACY)
        case MINUS => Subtract(a, b, EvalMode.LEGACY)
        case _ => Multiply(a, b, EvalMode.LEGACY)
      }
    case _ =>
      op match {
        case PLUS => Add(left, right, EvalMode.TRY)
        case MINUS => Subtract(left, right, EvalMode.TRY)
        case _ => Multiply(left, right, EvalMode.TRY)
      }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChArith =
    copy(left = newLeft, right = newRight)
}

object ChArith {
  final val PLUS = 0
  final val MINUS = 1
  final val MULTIPLY = 2
}

/** CH abs returns the UNSIGNED same-width type (NumberTraits::
  * ResultOfAbs) so abs(Int32.min) = 2147483648 is representable —
  * modeled as abs over the next-wider signed type (Spark ANSI abs would
  * throw, legacy would return the negative value unchanged). abs of
  * Int64.min stays the reference's wrap. */
case class ChAbs(child: Expression)
    extends RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case NullType => child // abs(NULL) is NULL (the reference's Nullable pass-through)
    case BooleanType | ByteType =>
      Abs(Cast(child, ShortType), failOnError = false)
    case ShortType => Abs(Cast(child, IntegerType), failOnError = false)
    case IntegerType => Abs(Cast(child, LongType), failOnError = false)
    case _ => Abs(child, failOnError = false)
  }
  override protected def withNewChildInternal(c: Expression): ChAbs =
    copy(child = c)
}

/** CH negate promotes to the signed next-wider type
  * (NumberTraits::ResultOfNegate) so -Int32.min is representable;
  * -Int64.min wraps (LEGACY). */
case class ChNegate(child: Expression)
    extends RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case NullType => child // negate(NULL) is NULL
    case BooleanType | ByteType => UnaryMinus(Cast(child, ShortType), failOnError = false)
    case ShortType => UnaryMinus(Cast(child, IntegerType), failOnError = false)
    case IntegerType => UnaryMinus(Cast(child, LongType), failOnError = false)
    case LongType => UnaryMinus(child, failOnError = false)
    case _ => UnaryMinus(child, failOnError = false)
  }
  override protected def withNewChildInternal(c: Expression): ChNegate =
    copy(child = c)
}
