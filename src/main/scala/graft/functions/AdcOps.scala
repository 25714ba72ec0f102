package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native ADC lookup-table builder (Jégou et al. 2011 §III-A): for one
  * query vector, `lut(s)(code) = ⟨sub_s(q), books(s)(code)⟩` — the
  * per-query table the asymmetric-distance scan gathers from.
  *
  * Exists for the same two reasons as [[SdcDot]]/[[NearestCentroids]]:
  * the HOF formulation (`array(transform(typedLit(books(s)), cvec =>
  * aggregate(zip_with(slice(q, …), cvec, _*_), …)) …)`) (a) embeds the
  * FULL m·ksub·dsub codebook table as an analyzed array literal in
  * every query plan — at production PQ shapes (m 16, ksub 256, dsub 64)
  * a 256k-double literal per query — and (b) evaluates interpreted,
  * m·ksub aggregate-HOF evaluations per query row. Here the codebooks
  * are ONE reference object shipped with the stage and the kernel is a
  * tight primitive triple loop inside whole-stage codegen.
  *
  * Arithmetic matches the HOF form bit-for-bit: each product is
  * `(double) qᵢ · cᵢ` accumulated left-to-right (the float subvector
  * element widened exactly as Catalyst's `Multiply(cast(float,double),
  * double)`). Slice semantics match `slice(q, s·dsub+1, dsub)`: a query
  * shorter than (s+1)·dsub contributes only its available elements.
  * Null query → null. */
case class PqLutExpr(child: Expression, books: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  require(books.nonEmpty && books.forall(_.nonEmpty),
    "codebooks must be non-empty")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val mat: Array[Array[Array[Double]]] =
    books.map(_.map(_.map(_.toDouble).toArray).toArray).toArray

  override protected def nullSafeEval(q: Any): Any =
    AdcOps.lut(q.asInstanceOf[ArrayData], mat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val matRef = ctx.addReferenceObj("pqBooks", mat, "double[][][]")
      s"${ev.value} = graft.functions.AdcOps.lut($q, $matRef);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqLutExpr = copy(child = newChild)
}

/** Native ADC gather-sum: `Σ_s lut(s)(codes(s))` — the per-candidate
  * compressed-domain dot of the asymmetric scan
  * ([[graft.pipeline.Similarity]] phase-1 ADC scoring). The HOF form
  * (`aggregate(zip_with(codes, lut, element_at(tbl, code+1)), …)`)
  * evaluates interpreted with array allocations per SCORED ROW — the
  * exact pathology [[SdcDot]] documents for the code-code case, here on
  * the (probed-cell rows × queries) scan. Kernel: m primitive gathers
  * inside whole-stage codegen.
  *
  * Null contract matches the HOF form: either side null → null; an
  * out-of-range code (`element_at` past the end) → null. */
case class AdcDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // out-of-range code → null
  override def prettyName: String = "adc_dot"

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    AdcOps.gather(codes.asInstanceOf[ArrayData],
      lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val r = ctx.freshName("adcRes")
      s"""java.lang.Double $r = graft.functions.AdcOps.gather(
         |  $codes, $lut);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcDotExpr =
    copy(left = newLeft, right = newRight)
}

object AdcOps {

  /** LUT kernel: `out(s)(code) = Σᵢ (double) q(s·dsub+i) · books(s)(code)(i)`
    * with `slice` clipping at the query's end. Shared by interpreted
    * eval and codegen. */
  def lut(q: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val qn = q.numElements()
    val out = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val bs = books(s)
      val ksub = bs.length
      val dsub = if (ksub == 0) 0 else bs(0).length
      val base = s * dsub
      val n = math.max(0, math.min(dsub, qn - base))
      val row = new Array[Double](ksub)
      var code = 0
      while (code < ksub) {
        val c = bs(code)
        var acc = 0.0d
        var i = 0
        while (i < n) {
          acc += q.getFloat(base + i).toDouble * c(i)
          i += 1
        }
        row(code) = acc
        code += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  /** Gather kernel: `Σ_s lut(s)(codes(s))`; null on an out-of-range
    * code (the `element_at` contract of the HOF form it replaces). */
  def gather(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val m = math.min(codes.numElements(), lut.numElements())
    var acc = 0.0d
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      val row = lut.getArray(s)
      if (code < 0 || code >= row.numElements()) return null
      acc += row.getDouble(code)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column builder: the per-query ADC lookup table. */
  def pqLut(q: Column, books: Seq[Seq[Seq[Float]]]): Column =
    Bridge.column(PqLutExpr(Bridge.expression(q), books))

  /** Column builder: the ADC gather-sum of one candidate's codes. */
  def adcDot(codes: Column, lut: Column): Column =
    Bridge.column(AdcDotExpr(Bridge.expression(codes),
      Bridge.expression(lut)))
}
