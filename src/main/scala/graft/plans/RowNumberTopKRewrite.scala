package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: the stock per-group top-k spelling —
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k`, rank column
  * projected away — is rewritten to the [[TopKPerGroup]] custom
  * operator, so users of the idiomatic pattern inherit the bounded-heap
  * physical plan (no per-partition sorts; see TopKPerGroup's scaladoc
  * for the honest Spark-4 WindowGroupLimit comparison: identical
  * shuffle volume, the win is heap O(n log k) vs two sort O(n log n)
  * passes, measured 1.3× at 67 rows/group and growing with group size).
  *
  * Fires ONLY when the rewrite is provably equivalent:
  *   - the Window computes exactly ONE expression and it is
  *     `row_number()` (any other window function, or a sibling window
  *     expression that would be lost, vetoes);
  *   - the partition keys are deterministic;
  *   - the filter keeps `rn <= k` / `rn < k` (either literal side) as
  *     a top-level conjunct; other conjuncts survive as a residual
  *     Filter but must not reference rn;
  *   - the rank column does not escape (not in the enclosing Project,
  *     not in the residual condition) — row_number's VALUE is only
  *     used as the gate, which TopKPerGroup reproduces exactly
  *     (including the arbitrary-tie-pick nondeterminism class: both
  *     forms pick some k of a tied boundary group).
  * A WindowGroupLimit node Spark's own InferWindowGroupLimit may have
  * inserted below the Window is skipped — TopKPerGroup subsumes it.
  * Output ORDER differs (heap emission vs window's clustered order);
  * per SQL semantics, order without an explicit Sort is unspecified,
  * and every consumer needing order sorts above — same license
  * Catalyst's own exchange/aggregate reorderings rely on.
  * Idempotent: the result contains no Window to re-match.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  private object L {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  /** The single row_number window expression, or None. */
  private def rowNumberAlias(w: Window): Option[Alias] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some(a)
      case _ => None
    }

  /** `rn <= k` in any spelling → k, as a top-level conjunct. */
  private def gateK(conjunct: Expression, rnId: ExprId): Option[Long] =
    conjunct match {
      case LessThanOrEqual(a: Attribute, L(k)) if a.exprId == rnId => Some(k)
      case LessThan(a: Attribute, L(k)) if a.exprId == rnId => Some(k - 1)
      case GreaterThanOrEqual(L(k), a: Attribute) if a.exprId == rnId =>
        Some(k)
      case GreaterThan(L(k), a: Attribute) if a.exprId == rnId => Some(k - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, Filter(cond, w: Window))
        if rowNumberAlias(w).isDefined &&
          w.partitionSpec.forall(_.deterministic) =>
      val rn = rowNumberAlias(w).get
      val conjuncts = splitConjuncts(cond)
      val gates = conjuncts.flatMap(c => gateK(c, rn.exprId).map(c -> _))
      val residue = conjuncts.filterNot(c => gates.exists(_._1 eq c))
      val escapes =
        projList.exists(_.references.exists(_.exprId == rn.exprId)) ||
          residue.exists(_.references.exists(_.exprId == rn.exprId))
      if (gates.isEmpty || escapes) p
      else {
        val k = gates.map(_._2).min
        // k < 1 keeps nothing, k beyond Int range keeps everything —
        // leave both degenerate forms to the stock pipeline
        if (k < 1 || k > Int.MaxValue) p
        else {
          // skip a WindowGroupLimit Spark already inserted — TopKPerGroup
          // subsumes its work
          val child = w.child match {
            case WindowGroupLimit(_, _, _, _, grandChild) => grandChild
            case other => other
          }
          val topk = TopKPerGroup(w.partitionSpec, w.orderSpec, k.toInt,
            child)
          val filtered =
            if (residue.isEmpty) topk
            else Filter(residue.reduce(And), topk)
          Project(projList, filtered)
        }
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
