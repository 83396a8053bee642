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

  private def isIntNum(e: Expression): Boolean = e.resolved && (e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  })

  private def coerce(e: Expression): Expression = if (isNum(e)) toBool(e) else e

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // dialect-gated (ChSql.sql sets the flag around query construction):
    // resolution rules run at analyzer fixpoint on EVERY query, and the
    // clean r13 bench A/B measured the always-on form at ~1.1-1.3x per
    // query across the whole 284-query surface; DataFrame-path plans
    // spell their predicates explicitly and never need CH truthiness
    if (!ChDialect.on(conf)) return plan
    // a Float64-TYPED filter expression is rejected by the reference
    // (ILLEGAL_TYPE_OF_COLUMN_FOR_FILTER) — float OPERANDS inside
    // logical functions are fine there (they coerce to UInt8), so only
    // the condition's own type matters
    val p1 = plan.resolveOperators {
      case f @ Filter(cond, _) if isNum(cond) =>
        cond.dataType match {
          case FloatType | DoubleType =>
            throw new IllegalArgumentException(
              "ILLEGAL_TYPE_OF_COLUMN_FOR_FILTER: Float filter conditions " +
                "are rejected by the reference")
          case _ => f.copy(condition = toBool(cond))
        }
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
      // HOF predicate lambdas accept INTEGRAL truthiness only — a
      // Float lambda result is the reference's
      // ILLEGAL_TYPE_OF_COLUMN_FOR_FILTER (00182 anchor shape)
      case af @ ArrayFilter(_, lf @ LambdaFunction(body, _, _)) if isIntNum(body) =>
        af.copy(function = lf.copy(function = toBool(body)))
      case ae @ ArrayExists(_, lf @ LambdaFunction(body, _, _), _) if isIntNum(body) =>
        ae.copy(function = lf.copy(function = toBool(body)))
      case aa @ ArrayForAll(_, lf @ LambdaFunction(body, _, _)) if isIntNum(body) =>
        aa.copy(function = lf.copy(function = toBool(body)))
      case mf @ MapFilter(_, lf @ LambdaFunction(body, _, _)) if isIntNum(body) =>
        mf.copy(function = lf.copy(function = toBool(body)))
    }
  }
}

/** The inverse coercion: CH has no separate boolean type — comparisons
  * and logical ops yield UInt8, so `sum(x = 1)`, `avg(x > 2)` and
  * `n + (n = 2)` are ordinary numeric expressions (reference
  * src/DataTypes/DataTypesNumber.h: Bool IS UInt8). Spark's BooleanType
  * is rejected by numeric aggregates and arithmetic at analysis; this
  * dialect-gated RESOLUTION rule inserts the 0/1 cast exactly where a
  * numeric was required and a boolean was supplied. */
object ChBoolAsNumeric extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Sum}

  private def isBool(e: Expression): Boolean =
    e.resolved && e.dataType == BooleanType
  private def toNum(e: Expression): Expression =
    if (isBool(e)) Cast(e, IntegerType) else e

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!ChDialect.on(conf)) return plan
    plan.resolveExpressions {
      case s @ Sum(child, _) if isBool(child) =>
        s.copy(child = Cast(child, IntegerType))
      case a @ Average(child, _) if isBool(child) =>
        a.copy(child = Cast(child, IntegerType))
      case b: BinaryArithmetic if isBool(b.left) || isBool(b.right) =>
        b.withNewChildren(Seq(toNum(b.left), toNum(b.right)))
      case m @ UnaryMinus(child, _) if isBool(child) =>
        m.copy(child = Cast(child, IntegerType))
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
  // the reference's #58680 fix applies to constants PARSED FROM THE
  // QUERY TEXT; a foldable non-literal (e.g. pi()) is compared in
  // Float64 there, so only Literal / Cast-of-Literal / negated-Literal
  // shapes qualify here
  private def isQueryLiteral(e: Expression): Boolean = e match {
    case _: Literal => true
    case Cast(c, _, _, _) => isQueryLiteral(c)
    case UnaryMinus(c, _) => isQueryLiteral(c)
    case _ => false
  }
  private def isFoldableLit(e: Expression): Boolean =
    e.resolved && isQueryLiteral(e) && (e.dataType match {
      case DoubleType | StringType => true
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!ChDialect.on(conf)) return plan // see ChBooleanCoercion
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
}

/** CH's default NULL placement in ORDER BY: NULLs sort LAST in BOTH
  * directions unless NULLS FIRST/LAST is spelled out (reference
  * SortDescription nulls_direction; pinned by 00426_nulls_sorting —
  * both the ASC and the DESC block end with \N). Spark's ASC default is
  * NULLS FIRST, so flip it; DESC already defaults to NULLS LAST.
  * Explicit spellings are indistinguishable post-parse, so ChSql.sql
  * sets spark.graft.chExplicitNulls for queries whose TEXT contains an
  * explicit NULLS FIRST/LAST and the rule stands down for them. */
object ChNullsOrdering extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Sort
  val skipKey = "spark.graft.chExplicitNulls"
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!ChDialect.on(conf) ||
        conf.getConfString(skipKey, "false").toBoolean) plan
    else plan.resolveOperators {
      case s: Sort =>
        val fixed = s.order.map {
          case so @ SortOrder(_, Ascending, NullsFirst, _) =>
            so.copy(nullOrdering = NullsLast)
          case so => so
        }
        if (fixed == s.order) s else s.copy(order = fixed)
    }
}

/** CH freely converts Date to integers — toUInt16(date) is the
  * days-since-epoch number (reference FunctionsConversion: DayNum is a
  * UInt16 underneath). Spark forbids DATE -> integral casts at analysis,
  * so rewrite them to datediff-from-epoch. Dialect-gated. */
object ChDateIntCast extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!ChDialect.on(conf)) plan
    else plan.resolveExpressions {
      case c @ Cast(child, dt, tz, mode) if child.resolved &&
          child.dataType == DateType && (dt match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _: DecimalType => true
            case _ => false
          }) =>
        Cast(DateDiff(child, Literal(0, DateType)), dt, tz, mode)
    }
}

/** CH's `/` operator ALWAYS divides in Float64 (reference divide.cpp:
  * DivideFloatingImpl — 1/0 is inf, 0/0 is nan, never an error). Spark's
  * integral Divide under ANSI throws DIVIDE_BY_ZERO instead, so widen
  * both sides to double when BOTH are integral; decimal/decimal keeps
  * Spark's decimal division (CH also stays decimal there). */
object ChFloatDivision extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{CaseWhen, EqualTo, GreaterThan, If, IsNull, LessThan, Or}
  import org.apache.spark.sql.catalyst.expressions.EvalMode
  import org.apache.spark.sql.catalyst.trees.TreeNodeTag
  private val rewritten = TreeNodeTag[Boolean]("graft.chFloatDivision")
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!ChDialect.on(conf)) plan
    else plan.resolveExpressions {
      // the inner Divide carries a tag so the rule cannot re-fire on its
      // own output. The zero branch computes the IEEE result
      // (sign-of-zero aware: 1 / -0. is -inf, pinned by 00516); NULL
      // operands stay NULL; LEGACY eval mode on the guarded divide so a
      // residual zero can never throw.
      case d @ Divide(l0, r0, m)
          if d.resolved && m != EvalMode.LEGACY &&
            d.getTagValue(rewritten).isEmpty &&
            l0.deterministic && r0.deterministic &&
            (d.dataType == DoubleType ||
              // a fractional LITERAL is Float64 in the reference (Spark
              // parses `-0.`/`2.5` as DECIMAL); decimal/decimal COLUMN
              // division stays decimal in both engines
              (d.dataType.isInstanceOf[DecimalType] &&
                (l0.exists { case Literal(_, _: DecimalType) => true; case _ => false } ||
                 r0.exists { case Literal(_, _: DecimalType) => true; case _ => false }))) =>
        val (l, r) =
          if (d.dataType == DoubleType) (l0, r0)
          else (Cast(l0, DoubleType), Cast(r0, DoubleType))
        val zero = Literal(0.0)
        val negz = EqualTo(Cast(r, StringType), Literal("-0.0"))
        val pos = Literal(Double.PositiveInfinity)
        val neg = Literal(Double.NegativeInfinity)
        val zeroCase = CaseWhen(Seq(
          (GreaterThan(l, zero), If(negz, neg, pos)),
          (LessThan(l, zero), If(negz, pos, neg))),
          Literal(Double.NaN))
        val inner = Divide(l, r, EvalMode.LEGACY)
        inner.setTagValue(rewritten, true)
        If(Or(IsNull(l), IsNull(r)), Literal(null, DoubleType),
          CaseWhen(Seq((EqualTo(r, zero), zeroCase)), inner))
    }
}

/** The dialect flag: ChSql.sql sets it (save/restore, nesting-safe)
  * around query construction so the CH-semantics resolution rules fire
  * only for dialect-routed plans; DataFrame-path queries skip them. */
object ChDialect {
  val key = "spark.graft.chDialect"
  def on(conf: org.apache.spark.sql.internal.SQLConf): Boolean =
    conf.getConfString(key, "false").toBoolean
}

/** CH's join_use_nulls=0 DEFAULT: columns of the non-matched side of an
  * outer join are filled with the column type's DEFAULT (0 / '' / epoch
  * / []) — but ONLY when the column is non-Nullable; a Nullable(T)
  * column, whether declared in DDL or computed (`if(c, NULL, x)`),
  * keeps NULL (reference Interpreters/join_common + the join_use_nulls
  * setting, which the stateless suite runs with 0). The pre-join child
  * output's Spark nullability bit is exactly CH's Nullable bit here:
  * ChTypes maps non-Nullable DDL to nullable=false fields, and any
  * NULL-producing expression is nullable=true.
  *
  * Implementation: wrap every resolved outer Join with a Project that
  * coalesces the fillable columns under the SAME ExprIds, so operators
  * above — including parent joins in a stacked-join query — see the
  * filled values without any re-resolution. Gated behind
  * spark.graft.chJoinDefaults so only the reference-anchor runner sees
  * it — the oracle-checked query surface keeps ANSI NULLs. */
object ChJoinDefaults extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.{LeftOuter, RightOuter, FullOuter}
  import org.apache.spark.sql.catalyst.plans.logical.{Join, Project}

  private val done = new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("chJoinDefaults")

  private def default(dt: DataType): Option[Expression] = dt match {
    case _: NumericType | BooleanType => Some(Literal.default(dt))
    case StringType => Some(Literal.default(dt))
    case DateType | _: TimestampType | TimestampNTZType => Some(Literal.default(dt))
    case a: ArrayType =>
      Some(Cast(CreateArray(Seq.empty), a))
    case _ => None // maps/structs keep NULL
  }

  /** Attributes the join null-extends that CH would default-fill:
    * outer-side columns that were NON-nullable on the pre-join child
    * (the child output carries the pre-join nullability bit). */
  private def fillable(j: Join): Seq[Attribute] = j.joinType match {
    case LeftOuter => j.right.output.filterNot(_.nullable)
    case RightOuter => j.left.output.filterNot(_.nullable)
    case FullOuter =>
      // keys stay NULL on a full join: Spark's USING output is
      // coalesce(l.key, r.key), which must see the MATCH side's value —
      // filling the missing side first would shadow it with the type
      // default (00980: FULL JOIN USING(id, ...) must emit the real id)
      val keyIds = j.condition
        .map(_.references.map(_.exprId).toSet).getOrElse(Set.empty[ExprId])
      (j.left.output ++ j.right.output)
        .filterNot(_.nullable).filterNot(a => keyIds.contains(a.exprId))
    case _ => Seq.empty
  }

  private def fills(j: Join): Map[ExprId, Expression] = fillable(j).flatMap { a =>
    default(a.dataType).map(d => a.exprId -> d)
  }.toMap

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.chJoinDefaults", "false").toBoolean)
      return plan
    // Fire only once the WHOLE plan is resolved: USING-join hidden
    // columns (qualified access like s2.x) materialize into ancestor
    // project lists late in resolution, and rewriting the join output
    // before that leaves dangling references the attr-mapping below
    // cannot see. The resolution batch runs to fixpoint, so this rule
    // still gets its turn after everything else settles.
    if (!plan.resolved) return plan
    // The filled columns get FRESH ExprIds and ancestors are rewritten
    // to reference them (resolveOperatorsUpWithNewOutput): an Alias
    // reusing its child's ExprId is regenerated by DeduplicateRelations
    // during analysis, detaching anything resolved against it. Fresh
    // ids also give stacked joins CH semantics for free — a parent
    // join's ON condition is an ancestor reference, so it compares the
    // FILLED child-join outputs, while each join's own ON stays raw.
    plan.resolveOperatorsUpWithNewOutput {
      case j: Join if j.resolved && !j.getTagValue(done).contains(true) &&
          fills(j).nonEmpty =>
        val fm = fills(j)
        j.setTagValue(done, true)
        // a child may legally output the same ExprId twice (CH allows
        // `SELECT 1 AS a, a`) — fill each id ONCE (transformUpWithNewOutput
        // asserts mapping keys unique); later duplicates reuse the new attr
        val seen = scala.collection.mutable.LinkedHashMap.empty[ExprId, Attribute]
        val pairs: Seq[(NamedExpression, Option[(Attribute, Attribute)])] =
          j.output.map { a =>
            fm.get(a.exprId) match {
              case Some(d) =>
                val al = Alias(Coalesce(Seq(a, d)), a.name)(
                  qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
                // only the FIRST occurrence enters the attr mapping;
                // later duplicate positions get their own fresh-id fill
                // (a Project cannot reference a sibling alias)
                if (seen.contains(a.exprId)) (al, None)
                else { seen(a.exprId) = al.toAttribute; (al, Some(a -> al.toAttribute)) }
              case None => (a, None)
            }
          }
        // USING-join hidden columns resolve through metadataOutput,
        // bypassing the projectList chain the attr-mapping rewrites —
        // keep the raw attributes visible so such references stay
        // bound (they read the unfilled value; only reachable via
        // qualified hidden access, which no SELECT * ever sees).
        val raws = pairs.collect { case (_, Some((old, _))) => old }
        (Project(pairs.map(_._1) ++ raws, j), pairs.flatMap(_._2))
    }
  }
}

/** CH empty-set aggregate defaults (AggregateFunctionNull.h wrapping:
  * aggregates over a NON-Nullable argument keep a non-Nullable result,
  * so an aggregation over ZERO rows without GROUP BY returns the
  * function's type default — sum -> 0, min/max -> the type's default
  * value, avg -> nan — while a Nullable argument routes through the
  * Null combinator and yields NULL, which is also Spark's ANSI result).
  * 01528 pins the contrast: `SELECT sum(n) FROM empty` is 0 but
  * `sumOrNull(n)` is NULL.
  *
  * The rewrite keeps each output's ExprId (the Alias is re-created with
  * the SAME id) so ancestor references stay attached. Gated with the
  * anchor-runner flag: the oracle-checked surface keeps ANSI NULLs. */
object ChEmptySetAggDefaults extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Aggregate
  import org.apache.spark.sql.catalyst.expressions.aggregate._

  private val done =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("chEmptySetAgg")

  private def defaultFor(f: AggregateFunction): Option[Expression] = f match {
    case s: Sum if !s.child.nullable =>
      Some(Cast(Literal(0), s.dataType))
    case m: Min if !m.child.nullable => Literal.default(m.dataType) match {
      case d if d.dataType == m.dataType => Some(d)
      case _ => None
    }
    case m: Max if !m.child.nullable => Literal.default(m.dataType) match {
      case d if d.dataType == m.dataType => Some(d)
      case _ => None
    }
    case a: Average if !a.child.nullable && a.dataType == DoubleType =>
      Some(Literal(Double.NaN))
    // any/anyLast on an empty set produce the TYPE DEFAULT (reference
    // AggregateFunctionAny with non-Nullable argument; 03002)
    case f: First if !f.child.nullable => Literal.default(f.dataType) match {
      case d if d.dataType == f.dataType => Some(d)
      case _ => None
    }
    case l: Last if !l.child.nullable => Literal.default(l.dataType) match {
      case d if d.dataType == l.dataType => Some(d)
      case _ => None
    }
    case v: AnyValue if !v.child.nullable => Literal.default(v.dataType) match {
      case d if d.dataType == v.dataType => Some(d)
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val anchor = conf.getConfString("spark.graft.chJoinDefaults", "false").toBoolean
    if (!anchor) return plan
    // SET aggregate_functions_null_for_empty=1 flips every aggregate to
    // its -OrNull form (NULL on an empty set); SET
    // empty_result_for_aggregation_by_empty_set=1 drops the result row
    // entirely. Both are recognized by the anchor runner's SET handling.
    val nullForEmpty =
      conf.getConfString("spark.graft.chAggNullForEmpty", "false").toBoolean
    val emptyResult =
      conf.getConfString("spark.graft.chEmptyResultEmptySet", "false").toBoolean
    if (!plan.resolved) return plan
    plan.resolveOperatorsUp {
      case a: Aggregate if a.resolved && a.groupingExpressions.isEmpty &&
          !a.getTagValue(done).contains(true) =>
        a.setTagValue(done, true)
        if (emptyResult) {
          // keep the aggregate row only when at least one row aggregated
          val cnt = Alias(
            Count(Literal(1)).toAggregateExpression(), "__er_cnt")()
          val agg2 = a.copy(
            aggregateExpressions = a.aggregateExpressions :+ cnt)
          agg2.setTagValue(done, true)
          org.apache.spark.sql.catalyst.plans.logical.Project(
            a.output,
            org.apache.spark.sql.catalyst.plans.logical.Filter(
              GreaterThan(cnt.toAttribute, Literal(0L)), agg2))
        } else if (nullForEmpty) {
          // the -OrNull rewrite matches Spark's ANSI behavior for
          // sum/min/max/avg, and count() is EXEMPT in the reference
          // (01528: count over empty stays 0 under the setting) — so
          // simply skip the type-default coalesce
          a
        } else {
          val newExprs = a.aggregateExpressions.map {
            case al @ Alias(child, name) =>
              // the default-coalesce applies at ANY depth (03002:
              // uniq(b) * any(b) — the product of two defaulted
              // aggregates, not a bare aggregate)
              // transformUp: the rewritten Coalesce(ae, d) is not
              // re-visited (transformDown would re-match ae forever)
              val rewritten = child.transformUp {
                case ae: AggregateExpression
                    if !ae.isDistinct && ae.filter.isEmpty =>
                  defaultFor(ae.aggregateFunction) match {
                    case Some(d) => Coalesce(Seq(ae, d))
                    case None => ae
                  }
              }
              if (rewritten eq child) al
              else Alias(rewritten, name)(exprId = al.exprId,
                qualifier = al.qualifier,
                explicitMetadata = Some(al.metadata))
            case other => other
          }
          if (newExprs == a.aggregateExpressions) a
          else a.copy(aggregateExpressions = newExprs)
        }
    }
  }
}
