package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: a `count(DISTINCT k)` that is consumed ONLY as a
  * pair-existence gate — `HAVING count(DISTINCT k) >= 2` (or `> 1`,
  * `<= 1`, `< 2`, `= 1`) with the count itself projected away — is
  * replaced by `min(k)` / `max(k)` and the gate by
  * `coalesce(min != max, false)`.
  *
  * Why it pays: Spark plans a distinct aggregate as TWO exchanges (a
  * partial-distinct aggregate keyed by (group, k), then the counting
  * aggregate keyed by group), because counting distinct values is not
  * algebraic. The gate predicate doesn't need the count: "at least two
  * distinct non-null values" is exactly `min(k) != max(k)`, and MIN/MAX
  * are algebraic — ONE exchange, with map-side partial aggregation
  * absorbing hot groups before the shuffle (the boilerplate-skew class
  * this gate is typically applied to: shared shingles, shared n-grams,
  * multi-tenant keys). `dedup_substring` hand-writes this shape; the
  * rule gives users of the stock spelling the same plan automatically.
  *
  * Value-preserving by construction (each mapping is an exact boolean
  * equivalence, never null, for c = count of distinct non-null k):
  *   - c >= 2 ≡ coalesce(min != max, false)   (0 non-null → min is
  *     null → comparison null → false, matching 0 >= 2)
  *   - c <= 1 ≡ NOT the above
  *   - c  = 1 ≡ coalesce(min  = max, false)
  * Guards: the count must be a single-argument DISTINCT with no FILTER
  * clause, k deterministic and orderable; the count's attribute must
  * not survive the rewrite anywhere — not in the enclosing Project and
  * not left over in the rewritten condition (a second, non-gate use
  * like `c >= 2 AND c < 10` vetoes the whole rewrite). Idempotent: the
  * result contains no distinct count to re-match.
  */
object DistinctGateRewrite extends Rule[LogicalPlan] {

  /** Long-valued literal (the analyzer promotes the INT in `c >= 2` to
    * BIGINT next to a count, but accept both). */
  private object L {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  private def gateableCounts(agg: Aggregate): Map[ExprId, Expression] =
    agg.aggregateExpressions.collect {
      case a @ Alias(ae: AggregateExpression, _)
          if ae.isDistinct && ae.filter.isEmpty &&
            (ae.aggregateFunction match {
              case Count(Seq(k)) =>
                k.deterministic && RowOrdering.isOrderable(k.dataType)
              case _ => false
            }) =>
        a.exprId -> ae.aggregateFunction.children.head
    }.toMap

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, Filter(cond, agg: Aggregate)) =>
      val counts = gateableCounts(agg)
      val projRefs = AttributeSet(projList.flatMap(_.references))
      val usable = counts.filter { case (id, _) =>
        !projRefs.exists(_.exprId == id)
      }
      if (usable.isEmpty) p
      else {
        // one (min, max) alias pair per rewritten count, created lazily
        // so unreferenced counts don't grow the aggregate
        val pairs = scala.collection.mutable.Map
          .empty[ExprId, (NamedExpression, NamedExpression)]
        def minMax(id: ExprId): (Attribute, Attribute) = {
          val (mn, mx) = pairs.getOrElseUpdate(id, {
            val k = usable(id)
            (Alias(Min(k).toAggregateExpression(), "_gate_mn")(),
              Alias(Max(k).toAggregateExpression(), "_gate_mx")())
          })
          (mn.toAttribute, mx.toAttribute)
        }
        def pairGate(id: ExprId): Expression = {
          val (mn, mx) = minMax(id)
          Coalesce(Seq(Not(EqualTo(mn, mx)), Literal.FalseLiteral))
        }
        def oneGate(id: ExprId): Expression = {
          val (mn, mx) = minMax(id)
          Coalesce(Seq(EqualTo(mn, mx), Literal.FalseLiteral))
        }
        def id(a: Attribute): Option[ExprId] =
          Some(a.exprId).filter(usable.contains)

        val newCond = cond.transformUp {
          case GreaterThanOrEqual(a: Attribute, L(2)) if id(a).isDefined =>
            pairGate(a.exprId)
          case GreaterThan(a: Attribute, L(1)) if id(a).isDefined =>
            pairGate(a.exprId)
          case LessThanOrEqual(L(2), a: Attribute) if id(a).isDefined =>
            pairGate(a.exprId)
          case LessThan(L(1), a: Attribute) if id(a).isDefined =>
            pairGate(a.exprId)
          case LessThanOrEqual(a: Attribute, L(1)) if id(a).isDefined =>
            Not(pairGate(a.exprId))
          case LessThan(a: Attribute, L(2)) if id(a).isDefined =>
            Not(pairGate(a.exprId))
          case GreaterThanOrEqual(L(1), a: Attribute) if id(a).isDefined =>
            Not(pairGate(a.exprId))
          case GreaterThan(L(2), a: Attribute) if id(a).isDefined =>
            Not(pairGate(a.exprId))
          case EqualTo(a: Attribute, L(1)) if id(a).isDefined =>
            oneGate(a.exprId)
          case EqualTo(L(1), a: Attribute) if id(a).isDefined =>
            oneGate(a.exprId)
        }
        val rewritten = pairs.keySet
        if (rewritten.isEmpty) p
        // a non-gate use of a rewritten count survives in the condition
        // (e.g. `c >= 2 AND c < 10`) → the count can't be dropped; veto
        else if (newCond.references.exists(r => rewritten.contains(r.exprId)))
          p
        else {
          val newAggExprs = agg.aggregateExpressions.flatMap {
            case a: Alias if rewritten.contains(a.exprId) =>
              val (mn, mx) = pairs(a.exprId)
              Seq(mn, mx)
            case other => Seq(other)
          }
          Project(projList,
            Filter(newCond, agg.copy(aggregateExpressions = newAggExprs)))
        }
      }
  }
}
