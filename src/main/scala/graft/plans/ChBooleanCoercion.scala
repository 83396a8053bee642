package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** CH treats any numeric as a boolean in boolean contexts — nonzero is
  * true (reference src/Functions/FunctionsLogical.cpp and
  * src/Interpreters/ExpressionAnalyzer.cpp: WHERE/HAVING/NOT/AND/OR and
  * higher-order-function predicates accept UInt8/ints/floats). Spark
  * rejects these at analysis, so this RESOLUTION rule inserts the
  * `x <> 0` coercion exactly where a boolean is required and a numeric
  * was supplied — plans that already type-check are untouched. */
object ChBooleanCoercion extends Rule[LogicalPlan] {
  private def isNum(e: Expression): Boolean = e.resolved && (e.dataType match {
    // Decimal carries Int128/Int256/UInt64 here, which the reference
    // REJECTS as filter/condition types (ILLEGAL_TYPE_OF_COLUMN_FOR_FILTER)
    case _: DecimalType => false
    case _: NumericType => true
    case _ => false
  })

  private def toBool(e: Expression): Expression =
    Not(EqualTo(e, Cast(Literal(0), e.dataType)))

  private def coerce(e: Expression): Expression = if (isNum(e)) toBool(e) else e

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val p1 = plan.resolveOperators {
      case f @ Filter(cond, _) if isNum(cond) => f.copy(condition = toBool(cond))
    }
    p1.resolveExpressions {
      case Not(e) if isNum(e) => Not(toBool(e))
      case a @ And(l, r) if isNum(l) || isNum(r) =>
        a.copy(left = coerce(l), right = coerce(r))
      case o @ Or(l, r) if isNum(l) || isNum(r) =>
        o.copy(left = coerce(l), right = coerce(r))
      case i @ If(pred, _, _) if isNum(pred) => i.copy(predicate = toBool(pred))
      case cw @ CaseWhen(branches, _) if branches.exists(b => isNum(b._1)) =>
        cw.copy(branches = branches.map { case (c, v) => (coerce(c), v) })
      case af @ ArrayFilter(_, lf @ LambdaFunction(body, _, _)) if isNum(body) =>
        af.copy(function = lf.copy(function = toBool(body)))
      case ae @ ArrayExists(_, lf @ LambdaFunction(body, _, _), _) if isNum(body) =>
        ae.copy(function = lf.copy(function = toBool(body)))
      case aa @ ArrayForAll(_, lf @ LambdaFunction(body, _, _)) if isNum(body) =>
        aa.copy(function = lf.copy(function = toBool(body)))
      case mf @ MapFilter(_, lf @ LambdaFunction(body, _, _)) if isNum(body) =>
        mf.copy(function = lf.copy(function = toBool(body)))
    }
  }
}

/** CH compares Float32 columns with literals by parsing the literal AS
  * Float32 (reference issue #58680 fix in FunctionsComparison.h), so
  * `f32 = '49.9'` matches. Spark instead widens both sides to DOUBLE,
  * where (double)49.9f != 49.9. Rewrite comparisons whose one side is a
  * float column widened to double and whose other side is a foldable
  * literal: compare in Float32. */
object ChFloat32Compare extends Rule[LogicalPlan] {
  private def floatInDouble(e: Expression): Option[Expression] = e match {
    case Cast(inner, DoubleType, _, _) if inner.resolved &&
        inner.dataType == FloatType => Some(inner)
    case _ => None
  }
  private def isFoldableLit(e: Expression): Boolean =
    e.resolved && e.foldable && (e.dataType match {
      case DoubleType | StringType => true
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressions {
      case cmp: BinaryComparison =>
        (floatInDouble(cmp.left), floatInDouble(cmp.right)) match {
          case (Some(l), None) if isFoldableLit(cmp.right) =>
            cmp.withNewChildren(Seq(l, Cast(cmp.right, FloatType)))
          case (None, Some(r)) if isFoldableLit(cmp.left) =>
            cmp.withNewChildren(Seq(Cast(cmp.left, FloatType), r))
          case _ => cmp
        }
    }
}
