package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prefix every `levenshtein(a, b) <= k` (or `< k`)
  * predicate with the length lower bound `abs(length(a) - length(b))
  * <= k` — a theorem of edit distance (each edit changes the length by
  * at most one), so the rewrite never changes results; it only gives
  * codegen a constant-time short-circuit ahead of the O(|a|·|b|)
  * dynamic program. On a blocked fuzzy join this is the difference
  * between running the DP on every candidate pair and running it only
  * on length-compatible ones — the same class of win as the Jaccard
  * length-ratio prefilter, applied automatically at the PLAN level so
  * every user of `levenshtein` (SQL or DataFrame) inherits it.
  *
  * This is the (c)-tier of the custom-operator ladder (SURVEY §7.3):
  * the engine's one `Rule[LogicalPlan]`, injected by
  * [[graft.extensions.GraftExtensions]]. Scope: `Filter` conditions and
  * `Join` conditions — the two places a fuzzy-match predicate lands
  * after predicate pushdown.
  *
  * Idempotent by construction (the optimizer runs rules to fixpoint):
  * a guard is only added when no semantically-equal conjunct already
  * exists. Spark's own three-argument `levenshtein(a, b, k)` bounded
  * form is left untouched — its DP already early-exits, and the guard
  * would still be redundant work only when lengths always agree.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def guard(l: Expression, r: Expression, k: Expression,
      strict: Boolean): Expression = {
    val diff = Abs(Subtract(Length(l), Length(r)))
    if (strict) LessThan(diff, k) else LessThanOrEqual(diff, k)
  }

  private def rewrite(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.collect {
      // deterministic arguments only: the guard re-evaluates a and b,
      // and duplicating a non-deterministic expression (uuid(), rand())
      // would test the bound against DIFFERENT values than the DP sees
      case LessThanOrEqual(Levenshtein(a, b, None), k: Literal)
          if a.deterministic && b.deterministic =>
        guard(a, b, k, strict = false)
      case GreaterThanOrEqual(k: Literal, Levenshtein(a, b, None))
          if a.deterministic && b.deterministic =>
        guard(a, b, k, strict = false)
      case LessThan(Levenshtein(a, b, None), k: Literal)
          if a.deterministic && b.deterministic =>
        guard(a, b, k, strict = true)
      case GreaterThan(k: Literal, Levenshtein(a, b, None))
          if a.deterministic && b.deterministic =>
        guard(a, b, k, strict = true)
    }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (guards.isEmpty) cond else (guards :+ cond).reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val n = rewrite(cond)
      if (n.fastEquals(cond)) f else f.copy(condition = n)
    case j @ Join(_, _, _, Some(cond), _) =>
      val n = rewrite(cond)
      if (n.fastEquals(cond)) j else j.copy(condition = Some(n))
  }
}
