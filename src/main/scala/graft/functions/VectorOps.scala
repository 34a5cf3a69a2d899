package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Dot product of two `ARRAY<DOUBLE>` columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * This is the hot kernel of every pairwise vector stage (embedding NN,
  * cosine top-k): those plans evaluate it once per CANDIDATE PAIR, so any
  * per-call boxing multiplies by |pairs|. The three formulations measured
  * on this data (sf0.1, 4M pairs):
  *
  *   - higher-order `aggregate(zip_with(...))`: interpreted per element
  *     (Spark 4 runs array lambdas on InterpretedMutableProjection) — ~26 s;
  *   - Scala UDF with a while-loop: JIT'd loop but converts BOTH arrays to
  *     boxed `Seq[Double]` per pair — ~9 s of allocation;
  *   - this expression: reads `ArrayData.getDouble(i)` in generated Java,
  *     zero allocation per pair.
  *
  * Accumulation is sequential in index order — bit-identical to both
  * earlier forms and to the DuckDB oracle's `list_dot_product`.
  *
  * Embedding arrays are value-complete by construction (parquet list of
  * non-null floats); null ELEMENTS are not handled — a null array yields
  * null via the standard null-safe wrapper. Lengths are defensively
  * min()'d rather than asserted: a 100 TB corpus will contain a short row
  * somewhere, and a wrong-but-bounded dot beats a task-killing exception
  * there (the filter pipelines drop such rows explicitly).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes needs AbstractDataType, which Spark 4 keeps
  // private[sql] — a manual check is the public-API equivalent. Callers
  // must cast to ARRAY<DOUBLE> explicitly (vecs() does).
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorOps {
  /** Column-world entry point. */
  def dot_product(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
}
