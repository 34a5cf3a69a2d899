package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `|A ∩ B|` of two `ARRAY<STRING>` columns as a native Catalyst
  * expression — the count, without materializing the intersection.
  *
  * The stock spelling `size(array_intersect(a, b))` builds TWO hash sets
  * plus the deduplicated result `ArrayData` per row, only for `size` to
  * throw the array away. Containment/overlap verification evaluates this
  * once per CANDIDATE PAIR ([[graft.operators.DedupQueries
  * .dedupContainmentPrefix]]), so the per-call allocation multiplies by
  * |candidates|. This expression builds ONE set from the left array and
  * counts distinct hits from the right (`remove` on hit, so duplicate
  * elements on either side count once — exactly `array_intersect`'s
  * distinct semantics), allocating nothing else.
  *
  * Measured (10× hapax fixture, ~3.8M candidate rows, NOTES_r12): the
  * swap took the whole dedup_containment_prefix query 6.06 → 4.92 s
  * (−19%), all of it out of the verify stage.
  *
  * Null ELEMENTS follow `array_intersect`'s semantics exactly: a null
  * present on BOTH sides counts once (it is an element of the
  * intersection); a null ARRAY yields null via the standard null-safe
  * wrapper.
  */
case class StringArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_size expects (ARRAY<STRING>, ARRAY<STRING>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[Any]()
    var leftHasNull = false
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) leftHasNull = true
      else set.add(x.getUTF8String(i))
      i += 1
    }
    var c = 0
    var j = 0
    while (j < y.numElements()) {
      if (y.isNullAt(j)) {
        if (leftHasNull) { c += 1; leftHasNull = false }
      } else if (set.remove(y.getUTF8String(j))) c += 1
      j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val ln = ctx.freshName("leftHasNull")
      s"""
         |java.util.HashSet $set = new java.util.HashSet();
         |boolean $ln = false;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) $ln = true;
         |  else $set.add($a.getUTF8String($i));
         |}
         |int $c = 0;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  if ($b.isNullAt($j)) {
         |    if ($ln) { $c++; $ln = false; }
         |  } else if ($set.remove($b.getUTF8String($j))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object ArrayOps {
  /** Column-world entry point. */
  def intersect_size(a: Column, b: Column): Column =
    bridge.column(StringArrayIntersectSize(
      bridge.expression(a), bridge.expression(b)))
}
