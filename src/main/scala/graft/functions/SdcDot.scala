package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native symmetric-distance-computation dot (Jégou et al. 2011 §III):
  * given two PQ code arrays and the flat m·ksub² code-pair table
  * `table[s·ksub² + a·ksub + b] = ⟨books(s)(a), books(s)(b)⟩`, returns
  * Σ_s table[s·ksub² + qcodes[s]·ksub + ccodes[s]] — the compressed-domain
  * dot-product estimate scoring each candidate pair of
  * [[graft.pipeline.Similarity.knnJoinPq]].
  *
  * Exists because the HOF formulation (`aggregate(zip_with(codes, codes,
  * element_at(lit, …)))`) evaluates interpreted with two array
  * allocations per PAIR — on the SOAK corpus (10⁸ candidate pairs) it made
  * the compressed join 5× SLOWER than the full-vector join it exists to
  * beat. Here the table is ONE reference object shipped with the stage and
  * the kernel is m primitive gathers inside whole-stage codegen — the scan
  * fraction the PQ literature promises.
  *
  * Null contract: either side null → null. Code arrays shorter than m or
  * with out-of-range codes are a caller bug (codes come from
  * [[graft.pipeline.Similarity.pqTrain]]'s encoder) — the kernel
  * range-checks via the JVM's own array bounds. */
case class SdcDot(left: Expression, right: Expression,
    table: Array[Double], ksub: Int) extends BinaryExpression {

  require(ksub >= 1, "ksub must be >= 1")
  require(table.length % (ksub * ksub) == 0,
    s"table length ${table.length} is not a multiple of ksub^2")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sdc_dot"

  override protected def nullSafeEval(q: Any, c: Any): Any =
    SdcDot.gatherSum(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      table, ksub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val tabRef = ctx.addReferenceObj("sdcTable", table, "double[]")
      s"${ev.value} = graft.functions.SdcDot.gatherSum($q, $c, $tabRef, " +
        s"$ksub);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SdcDot = copy(left = newLeft, right = newRight)
}

object SdcDot {

  /** Kernel shared by interpreted eval and generated code. */
  def gatherSum(q: ArrayData, c: ArrayData, table: Array[Double],
      ksub: Int): Double = {
    val m = math.min(q.numElements(), c.numElements())
    val k2 = ksub * ksub
    var acc = 0.0d
    var s = 0
    while (s < m) {
      acc += table(s * k2 + q.getInt(s) * ksub + c.getInt(s))
      s += 1
    }
    acc
  }

  /** Column builder: SDC dot estimate of two PQ code columns against the
    * flat m·ksub² code-pair table. */
  def sdcDot(qcodes: Column, ccodes: Column, table: Seq[Double],
      ksub: Int): Column =
    Bridge.column(SdcDot(Bridge.expression(qcodes),
      Bridge.expression(ccodes), table.toArray, ksub))
}
