package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Count of common elements between two SORTED-ASCENDING arrays of
  * DISTINCT longs — a single merge scan, fully codegen'd.
  *
  * Exists to shave the winnowing verify join (VERDICT r9 next-round #8,
  * three rounds at #1 bench cost): `size(array_intersect(a, b))` builds a
  * per-row hash set AND materializes the intersection array just to take
  * its length; for pre-sorted distinct fingerprint arrays the same count
  * is an allocation-free O(|a|+|b|) two-pointer walk. Equality with the
  * `array_intersect` formulation on distinct inputs is property-pinned in
  * DedupProps (sortedness is the CALLER's contract — the shipped call
  * site sorts with `sort_array` once per document, amortized over every
  * candidate pair the doc appears in).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"$prettyName expects two ARRAY<BIGINT> inputs, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0L
    val la = x.numElements(); val lb = y.numElements()
    while (i < la && j < lb) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { n += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val la = ctx.freshName("la"); val lb = ctx.freshName("lb")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $i = 0, $j = 0;
         |final int $la = $a.numElements(), $lb = $b.numElements();
         |long ${ev.value}Acc = 0L;
         |while ($i < $la && $j < $lb) {
         |  final long $u = $a.getLong($i);
         |  final long $v = $b.getLong($j);
         |  if ($u == $v) { ${ev.value}Acc++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  /** Column form: count of common elements of two sorted distinct
    * ARRAY<BIGINT> columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedLongIntersectCount(
      Bridge.expression(a), Bridge.expression(b)))
}
