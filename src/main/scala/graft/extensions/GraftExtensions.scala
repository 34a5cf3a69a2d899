package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProduct, NgramHashes, SortedLongJaccard, StringArrayIntersectSize, WelchTTest}

/** Session extension registering the engine's custom expressions as SQL
  * functions — `welch_t`, `dot_product`, `ngram_hashes`,
  * `sorted_jaccard` — so SQL-only users reach the statistical and
  * dedup primitives from `spark.sql` (activate with
  * `.config("spark.sql.extensions", classOf[GraftExtensions].getName)`
  * or `.withExtensions`).
  *
  * This is the (c)-tier of the custom-operator ladder (SURVEY §7.3):
  * injected scalar functions plus FIVE optimizer rules
  * ([[graft.plans.LevenshteinPrefilter]] — the edit-distance length
  * lower bound as an automatic codegen short-circuit;
  * [[graft.plans.IntersectSizeRewrite]] — the stock
  * `size(array_intersect)` spelling rewritten to the allocation-free
  * native count; [[graft.plans.DistinctGateRewrite]] — a
  * `HAVING count(DISTINCT k) >= 2` pair gate rewritten to the
  * single-exchange algebraic `min != max` form;
  * [[graft.plans.ExplodeCountRewrite]] — the explode-then-count word
  * count spelling rewritten to `sum(size(arr))` with the Generate
  * eliminated; and [[graft.plans.RowNumberTopKRewrite]] — the
  * `row_number() <= k` spelling planned as the TopKPerGroup heap
  * operator) and a planner strategy; everything else is expressible
  * with stock Catalyst plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
    ext.injectOptimizerRule(_ => graft.plans.IntersectSizeRewrite)
    ext.injectOptimizerRule(_ => graft.plans.DistinctGateRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ExplodeCountRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RowNumberTopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectFunction((
      new FunctionIdentifier("welch_t"),
      new ExpressionInfo(classOf[WelchTTest].getName, "welch_t"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WelchTTest(args)))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName,
        "dot_product"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          s"dot_product takes 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          s"ngram_hashes takes (words, n), got ${args.length} arguments")
        // n shapes the compiled loop, so it must be a literal — a column
        // n would need a different (slower) expression entirely
        val n = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"ngram_hashes(words, n): n must be an INT literal, got $other")
        }
        NgramHashes(args(0), n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_jaccard"),
      new ExpressionInfo(classOf[SortedLongJaccard].getName,
        "sorted_jaccard"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          s"sorted_jaccard takes 2 arguments, got ${args.length}")
        SortedLongJaccard(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("intersect_size"),
      new ExpressionInfo(classOf[StringArrayIntersectSize].getName,
        "intersect_size"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          s"intersect_size takes 2 arguments, got ${args.length}")
        StringArrayIntersectSize(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(
        classOf[graft.functions.MisraGriesAgg].getName, "misra_gries"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          s"misra_gries takes (col, k), got ${args.length} arguments")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"misra_gries(col, k): k must be an INT literal, got $other")
        }
        graft.functions.MisraGriesAgg(args(0), k)
      }))
  }
}
