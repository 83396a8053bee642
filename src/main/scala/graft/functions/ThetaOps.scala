package graft.functions

import graft.aggregates.ThetaSetOps
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SQL surface of the uniqTheta set algebra (see aggregates.ThetaSetOps).
  * op: "union" returns a composable KMV state (array<bigint>);
  * "union_count" / "intersect_count" / "not_count" return estimates. */
case class ThetaSetOpExpr(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (op == "union") ArrayType(LongType, containsNull = false) else LongType
  override def nullSafeEval(l: Any, r: Any): Any = {
    def arr(x: Any): Array[Long] = x.asInstanceOf[ArrayData].toLongArray()
    op match {
      case "union" => new GenericArrayData(ThetaSetOps.union(arr(l), arr(r)))
      case "union_count" => ThetaSetOps.unionCount(arr(l), arr(r))
      case "intersect_count" => ThetaSetOps.intersectCount(arr(l), arr(r))
      case "not_count" => ThetaSetOps.notCount(arr(l), arr(r))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaSetOpExpr =
    copy(left = l, right = r)
}

/** Estimate of a KMV state (finalizeAggregation over a theta state).
  *
  * Two input shapes (the promise at ChSql's uniqTheta alias block):
  *  - array<bigint> KMV state (uniqThetaState / uniqThetaUnion) → estimate;
  *  - bigint (uniqThetaIntersect / uniqThetaNot already return counts here)
  *    → identity, so the reference's idiomatic
  *    finalizeAggregation(uniqThetaIntersect(a, b)) composes instead of
  *    class-cast-crashing on a Long. */
case class ThetaEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  private val passThrough = child.dataType == LongType
  override def nullSafeEval(input: Any): Any =
    if (passThrough) input
    else ThetaSetOps.estimate(input.asInstanceOf[ArrayData].toLongArray())
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case LongType | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"uniq_theta_estimate expects BIGINT or ARRAY<BIGINT> state, got ${other.sql}")
    }
  }
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}
