package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Aggregate-projection auto-routing (reference:
  * src/Processors/QueryPlan/Optimizations/optimizeUseAggregateProjection.cpp —
  * a GROUP BY that matches a materialized projection reads the projection
  * instead of the fact table).
  *
  * The Spark shape: a summary parquet per (fact, dims, measures) holding
  * per-group partial aggregates (`cnt`, `sum_<m>`, `min_<m>`, `max_<m>`).
  * The optimizer rule rewrites a matching `Aggregate` over the fact scan
  * into a RE-aggregation over the summary scan — sums of sums, mins of
  * mins — which is exact because sum/count/min/max are self-decomposable.
  * At 100 TB this is the difference between scanning the fact table and
  * scanning a table `|groups|` rows long.
  */
object ProjectionRouting {

  case class Projection(factPath: String, dims: Set[String],
                        measures: Set[String], summaryPath: String)

  private val registry = scala.collection.concurrent.TrieMap.empty[String, Projection]

  def register(p: Projection): Unit = registry.put(p.factPath, p)
  def clear(): Unit = registry.clear()

  /** Build (overwrite) the summary parquet and register the routing.
    * `factPath` must be the path the fact DataFrame actually scans. */
  def ensureSummary(spark: SparkSession, factPath: String, fact: DataFrame,
                    dims: Seq[String], measures: Seq[String],
                    summaryPath: String): Unit = {
    if (!registry.get(factPath).exists(p =>
        p.dims == dims.toSet && p.measures == measures.toSet &&
        p.summaryPath == summaryPath &&
        new java.io.File(summaryPath).exists())) {
      val aggs = count(lit(1)).as("cnt") +: measures.flatMap(m => Seq(
        sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m")))
      fact.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
        .write.mode("overwrite").parquet(summaryPath)
      register(Projection(factPath, dims.toSet, measures.toSet, summaryPath))
    }
  }

  private def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.headOption.map(_.toUri.getPath)
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scanPath(child)
    case _ => None
  }

  object Route extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      plan transform {
        case agg @ Aggregate(_, _, child, _) =>
          val routed = for {
            path <- scanPath(child)
            proj <- registry.get(path)
            rewritten <- tryRewrite(agg, proj)
          } yield rewritten
          routed.getOrElse(agg)
      }
    }

    private def tryRewrite(agg: Aggregate, proj: Projection): Option[LogicalPlan] = {
      val groupAttrs = agg.groupingExpressions.collect { case a: AttributeReference => a }
      if (groupAttrs.length != agg.groupingExpressions.length) return None
      if (!groupAttrs.map(_.name).toSet.subsetOf(proj.dims)) return None

      val summary = SparkSession.active.read.parquet(proj.summaryPath)
        .queryExecution.analyzed
      val byName = summary.output.map(a => a.name -> a).toMap

      def remapAgg(ae: AggregateExpression): Option[AggregateExpression] =
        ae.aggregateFunction match {
          case _ if ae.isDistinct || ae.filter.isDefined => None
          case Sum(a: AttributeReference, mode) if proj.measures(a.name) =>
            byName.get(s"sum_${a.name}").map(s => ae.copy(aggregateFunction = Sum(s, mode)))
          case Min(a: AttributeReference) if proj.measures(a.name) =>
            byName.get(s"min_${a.name}").map(m => ae.copy(aggregateFunction = Min(m)))
          case Max(a: AttributeReference) if proj.measures(a.name) =>
            byName.get(s"max_${a.name}").map(m => ae.copy(aggregateFunction = Max(m)))
          case Count(children) if children.forall(_.foldable) =>
            byName.get("cnt").map(c => ae.copy(aggregateFunction = Sum(c)))
          case _ => None
        }

      val newAggs = agg.aggregateExpressions.map {
        case a: AttributeReference if byName.contains(a.name) =>
          Some(Alias(byName(a.name), a.name)(exprId = a.exprId))
        case al @ Alias(ae: AggregateExpression, name) =>
          remapAgg(ae).map(n => Alias(n, name)(exprId = al.exprId))
        case al @ Alias(a: AttributeReference, name) if byName.contains(a.name) =>
          Some(Alias(byName(a.name), name)(exprId = al.exprId))
        case _ => None
      }
      if (newAggs.exists(_.isEmpty)) return None
      val newGroupings = groupAttrs.map(a => byName(a.name))
      Some(Aggregate(newGroupings, newAggs.map(_.get), summary, None))
    }
  }
}
