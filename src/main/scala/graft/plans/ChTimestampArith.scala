package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Expression, Subtract, TimestampAdd, UnaryMinus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** CH's bare DateTime ± Int arithmetic (reference
  * src/Functions/FunctionBinaryArithmetic.h — DateTime + N means
  * N SECONDS; Date + N already means N days, which Spark shares).
  * Spark rejects timestamp ± integral at analysis, so this RESOLUTION
  * rule rewrites the mismatched Add/Subtract into TimestampAdd(SECOND)
  * before type checking fails. */
object ChTimestampArith extends Rule[LogicalPlan] {
  private def isTs(e: Expression): Boolean = e.resolved && (e.dataType match {
    case _: TimestampType | TimestampNTZType => true
    case _ => false
  })
  private def isIntegral(e: Expression): Boolean = e.resolved && (e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  })
  // a day-count offset wider than INT: BIGINT, or the scale-0 DECIMAL
  // that CH UInt64/Int128/UInt128 columns map to
  private def isWideInt(e: Expression): Boolean = e.resolved && (e.dataType match {
    case LongType => true
    case d: DecimalType => d.scale == 0
    case _ => false
  })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressions {
      case Add(l, r, _) if isTs(l) && isIntegral(r) =>
        TimestampAdd("SECOND", r, l)
      case Add(l, r, _) if isIntegral(l) && isTs(r) =>
        TimestampAdd("SECOND", l, r)
      case Subtract(l, r, _) if isTs(l) && isIntegral(r) =>
        TimestampAdd("SECOND", UnaryMinus(r), l)
      // the ANSI coercion turns `ts - x` into SubtractTimestamps before
      // this rule sees a plain Subtract
      case st: org.apache.spark.sql.catalyst.expressions.SubtractTimestamps
          if isTs(st.left) && isIntegral(st.right) =>
        TimestampAdd("SECOND", UnaryMinus(st.right), st.left)
      // CH Date ± UInt/Int of any width means days; Spark's date_add
      // rejects BIGINT offsets (`number % 7` is LongType) and the
      // scale-0 DECIMALs that UInt64/Int128 columns map to
      case da @ org.apache.spark.sql.catalyst.expressions.DateAdd(_, n)
          if isWideInt(n) =>
        da.copy(days = org.apache.spark.sql.catalyst.expressions.Cast(
          n, org.apache.spark.sql.types.IntegerType))
      case ds @ org.apache.spark.sql.catalyst.expressions.DateSub(_, n)
          if isWideInt(n) =>
        ds.copy(days = org.apache.spark.sql.catalyst.expressions.Cast(
          n, org.apache.spark.sql.types.IntegerType))
    }
}
