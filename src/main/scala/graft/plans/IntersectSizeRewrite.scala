package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.StringArrayIntersectSize

/** Optimizer rule: rewrite `size(array_intersect(a, b))` over
  * `ARRAY<STRING>` inputs to the native counting expression
  * [[StringArrayIntersectSize]] — the stock spelling builds two hash
  * sets plus the deduplicated result array per row only for `size` to
  * discard it, and overlap-style similarity predicates evaluate it once
  * per candidate pair. The engine's second `Rule[LogicalPlan]`
  * (SURVEY §7.3 tier (c), alongside [[LevenshteinPrefilter]]): users
  * write the standard Spark spelling — SQL or DataFrame — and inherit
  * the allocation-free count automatically.
  *
  * Semantics-preserving by construction: [[StringArrayIntersectSize]]
  * matches `array_intersect`'s distinct AND null-element semantics
  * exactly (a both-sides null counts once — pinned by ArrayOpsSpec),
  * each argument is referenced exactly once on both sides of the
  * rewrite (so non-deterministic inputs stay single-evaluation), and
  * the rewrite is skipped under `spark.sql.legacy.sizeOfNull` (where
  * `size(NULL)` must return −1, not NULL — the Size node carries the
  * captured flag). Idempotent trivially: the result node contains no
  * `Size` to re-match.
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {

  private def strArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), legacy)
          if !legacy && strArr(a) && strArr(b) =>
        StringArrayIntersectSize(a, b)
    }
}
