package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Hash-aggregable argmax with a smallest-id tie-break: maximize `ord`
  * (double); on equal `ord` keep the smallest `id` (long); result is
  * `struct(ord, id)`, null on an all-null group.
  *
  * Exists because the stock spelling `max(struct(ord, -id))` carries a
  * STRUCT aggregation buffer, which `HashAggregateExec` cannot hold in
  * its mutable row — Spark silently falls back to `SortAggregate` and
  * inserts a full Sort of the aggregate's INPUT. For the brute-force
  * NN sweeps that input is the N×block pair fan-out: the r15 audit
  * measured `dedup_embedding_nn` spilling 43 GB at the 10× fixture
  * sorting rows a running argmax never needed to materialize. This
  * aggregate's buffer is (double, long, boolean) — all primitive — so
  * the partial aggregate pipelines inside whole-stage codegen directly
  * over the join output, exactly like `max(cos)` would.
  *
  * Selection-identical to `max(struct(ord, -id))`: same NaN-greatest
  * double ordering (GreaterThan on DoubleType), same min-id tie-break.
  * Null `ord`/`id` input rows are skipped, like `max`. */
case class ArgMaxTiebreak(ord: Expression, id: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ord, id)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), id = newChildren(1))
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("ord", DoubleType), StructField("id", LongType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arg_max_tiebreak expects (DOUBLE, BIGINT), got " +
        s"(${ord.dataType.sql}, ${id.dataType.sql})")

  private lazy val bestOrd =
    AttributeReference("best_ord", DoubleType, nullable = false)()
  private lazy val bestId =
    AttributeReference("best_id", LongType, nullable = false)()
  private lazy val nonEmpty =
    AttributeReference("nonempty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes
      : Seq[AttributeReference] = Seq(bestOrd, bestId, nonEmpty)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Double.NegativeInfinity), Literal(Long.MaxValue),
    Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = IsNotNull(ord) && IsNotNull(id)
    // strictly-better OR first valid value; KnownNotNull keeps the
    // mutable buffer slots non-nullable through codegen
    val better = Not(nonEmpty) ||
      GreaterThan(KnownNotNull(ord), bestOrd) ||
      (EqualTo(KnownNotNull(ord), bestOrd) &&
        LessThan(KnownNotNull(id), bestId))
    val take = valid && better
    Seq(
      If(take, KnownNotNull(ord), bestOrd),
      If(take, KnownNotNull(id), bestId),
      nonEmpty || valid)
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = nonEmpty.right && (Not(nonEmpty.left) ||
      GreaterThan(bestOrd.right, bestOrd.left) ||
      (EqualTo(bestOrd.right, bestOrd.left) &&
        LessThan(bestId.right, bestId.left)))
    Seq(
      If(take, bestOrd.right, bestOrd.left),
      If(take, bestId.right, bestId.left),
      nonEmpty.left || nonEmpty.right)
  }

  override lazy val evaluateExpression: Expression = If(nonEmpty,
    CreateNamedStruct(Seq(
      Literal("ord"), bestOrd, Literal("id"), bestId)),
    Literal(null, dataType))
}

object ArgMax {
  /** `arg_max_tiebreak(ord, id)` → struct(ord, id): max ord, min id on
    * ties — the hash-aggregable replacement for max(struct(ord, -id)). */
  def arg_max_tiebreak(ord: Column, id: Column): Column =
    bridge.column(ArgMaxTiebreak(bridge.expression(ord),
      bridge.expression(id)).toAggregateExpression())
}
