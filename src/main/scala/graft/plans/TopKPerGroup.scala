package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.bridge

/** Per-group top-k as a first-class operator — the (c)-tier of the
  * custom-operator ladder (logical node + planner [[SparkStrategy]] +
  * two-phase physical operator) completed end to end, with an HONEST
  * account of what Spark 4 already does: the stock
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` spelling gets
  * Spark's own WindowGroupLimit rewrite, which also bounds the
  * exchange (measured in `tools.TopKAb`: byte-identical shuffle record
  * counts for both arms). What the stock path still pays is TWO full
  * per-partition sorts — WindowGroupLimitExec sorts its input below
  * AND above the exchange, O(n log n) each — where [[TopKExec]] keeps
  * a bounded k-heap per group, O(n log k), no sort anywhere
  * (measured: 0.83 → 0.71 s on 3M rows at 67 rows/group; the gap
  * widens with rows-per-group since n/k is the sort's wasted log
  * factor). The operator also generalizes where the window rewrite
  * cannot: any k per call site, orderings over expressions the
  * rank-limit pattern matcher misses, and direct DataFrame
  * composition without a rank column.
  *
  * The PARTIAL stage runs on each input partition before the exchange
  * (at most groups·k rows per partition shuffled), the FINAL stage
  * merges heap remnants after a hash exchange on the group key.
  *
  * Memory bound: groups-per-partition · k rows, the hash-aggregate
  * class. A production operator would add spilling for pathological
  * group cardinalities; the aggregate-buffer-style bound is documented
  * rather than hidden (same posture as Spark's own
  * ObjectHashAggregate fallback threshold).
  *
  * Output contract: for each group, exactly the first k rows of the
  * group under `order` (ties broken by the order expressions ONLY — a
  * caller wanting determinism appends a tiebreak column, as with any
  * LIMIT). Row order across groups is not defined; callers sort for
  * presentation.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"topKPerGroup needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : LogicalPlan = copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroup → partial + final TopKExec.
  * Injected by GraftExtensions AND self-registered by [[TopK.perGroup]]
  * via `spark.experimental.extraStrategies`, so the operator works in
  * any session that built the plan through the API. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      // float/double group keys must be normalized (0.0 == -0.0,
      // canonical NaN) exactly as Spark's NormalizeFloatingNumbers rule
      // does for Aggregate/Window/Join keys — that rule doesn't match a
      // custom node, so the strategy applies the same normalization
      // here, where the expressions are resolved. Both the hash
      // partitioning (ClusteredDistribution on these exprs) and the
      // exec's byte-equality map key see the normalized values.
      val gn = g.map(bridge.normalizeFloats)
      TopKExec(gn, o, k, partial = false,
        TopKExec(gn, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    // empty keys = GLOBAL top-k: the final stage needs all partial
    // remnants in one place (AllTuples — ClusteredDistribution(Nil) is
    // rejected by its own require). The partial stage still bounds what
    // crosses the exchange at k rows per input partition, which is the
    // whole point vs a global sort.
    else if (groupExprs.isEmpty) Seq(org.apache.spark.sql.catalyst.plans
      .physical.AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    // locals only — the closure must not capture `this` (a SparkPlan is
    // not serializable)
    val (groupE, ordE, kk, childOut) = (groupExprs, order, k, child.output)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOut)
      val ord = GenerateOrdering.generate(ordE, childOut)
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // max-heap under `ord`: the head is the WORST retained row,
          // evicted when a better one arrives
          heap = scala.collection.mutable.PriorityQueue
            .empty[InternalRow](ord.asInstanceOf[Ordering[InternalRow]])
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}

/** DataFrame-level entry point. */
object TopK {
  def perGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    // self-register the strategy so the operator plans in ANY session
    // (specs, tools) — not only extension-installed ones. Synchronized:
    // the read-modify-write would otherwise race with a concurrent
    // registration (parallel plan builders in one session) and drop a
    // strategy. Deliberate session-state side effect, documented here.
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(GraftStrategies))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GraftStrategies
    }
    // EAGER conversion (bridge.eagerExpression): the lazy wrapper the
    // plain bridge returns survives analysis inside a custom node and
    // is not serializable
    val sortOrder = order.map(c => bridge.eagerExpression(spark, c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    bridge.ofRows(spark,
      TopKPerGroup(keys.map(c => bridge.eagerExpression(spark, c)),
        sortOrder, k, df.queryExecution.logical))
  }
}
