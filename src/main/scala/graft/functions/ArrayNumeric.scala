package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: integer dot product of two `array<bigint>`
  * columns, `Σ aᵢ·bᵢ` over the common prefix length.
  *
  * Exists because the `zip_with` + `aggregate` higher-order-function
  * formulation is evaluated INTERPRETED (one closure dispatch plus a fresh
  * intermediate array per row) — on an all-pairs near-dup scan that is the
  * entire inner loop. This expression participates in whole-stage codegen
  * (`doGenCode` emits a tight primitive `long` loop over the unsafe array
  * word-aligned data, no allocation), turning the O(pairs · dim) kernel into
  * JIT-compiled multiply-adds. SURVEY.md §7.4: custom Expression is the
  * preferred extension point when built-ins can't express the hot kernel.
  *
  * Null contract: null if either array is null; elements are assumed
  * non-null (inputs are produced by quantization of non-null vectors —
  * see [[graft.pipeline.Dedup.embeddingNearDupPairs]]).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // No ExpectsInputTypes (AbstractDataType is private[sql]); inputs are
  // constructed internally as array<bigint> by the callers below.
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayNumeric {
  /** `Σ aᵢ·bᵢ` for two `array<bigint>` columns (codegen'd; see
    * [[LongArrayDot]]). */
  def longDot(a: Column, b: Column): Column =
    Bridge.column(LongArrayDot(Bridge.expression(a), Bridge.expression(b)))

  /** Exact squared L2 norm `Σ aᵢ²` of an `array<bigint>` column. */
  def longNormSq(a: Column): Column = longDot(a, a)

  /** Register `long_array_dot` in a session's function registry so it is
    * callable from SQL text (`SELECT long_array_dot(a, b) ...`). For
    * config-driven registration use [[graft.GraftExtensions]] instead. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_array_dot",
      exprs => LongArrayDot(exprs.head, exprs(1)),
      "built-in")
}
