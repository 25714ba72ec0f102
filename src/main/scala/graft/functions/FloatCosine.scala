package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * columns in ONE pass — the ANN scoring kernel.
  *
  * The declarative form (`zip_with` product + two `aggregate` norms +
  * sqrt/when) traverses each vector pair THREE times and materializes two
  * intermediate arrays per row; on a top-k scan that is the entire inner
  * loop. This expression fuses the three accumulators into one codegen'd
  * loop over the unsafe array data — no allocation, O(pairs · dim)
  * JIT-compiled multiply-adds (same motivation as [[LongArrayDot]],
  * SURVEY.md §7.4).
  *
  * Arithmetic is BIT-IDENTICAL to the declarative form it replaces
  * (property-pinned in PipelineSpec): per element a FLOAT multiply whose
  * result is widened to double for the running sum (`x * y` on floats,
  * then `acc + x` against a double accumulator — exactly what
  * `aggregate(zip_with(...), 0.0d, _ + _)` evaluates), `sqrt(na)*sqrt(nb)`
  * as the denominator, literal 0.0 when the denominator is zero.
  *
  * Null contract replicates the declarative form exactly: null array →
  * null; a null ELEMENT nulls that array's norm and the dot, so the
  * result is null; mismatched lengths null the dot (zip_with pads with
  * null), so the result is 0.0 when the denominator is zero (both norms
  * computable and zero) and null otherwise.
  */
case class FloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_cosine"

  /** Both inputs MUST be `array<float>` — `ArrayData.getFloat` reads 4 bytes
    * per element off the unsafe buffer, so an `array<double>` input would
    * return silently wrong scores under codegen rather than fail. Reject at
    * analysis time instead. */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Returns null for NON-null inputs too (null element, mismatched
    * lengths), so nullability cannot be derived from the children: with
    * non-nullable children the default would leave `ev.isNull` undeclared
    * in the non-nullable codegen branch and lie to downstream operators in
    * the interpreted path. */
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val an = a.numElements()
    val bn = b.numElements()
    var naNull = false; var nbNull = false
    var na = 0.0d; var nb = 0.0d
    var i = 0
    while (i < an && !naNull) {
      if (a.isNullAt(i)) naNull = true
      else { val x = a.getFloat(i); na += (x * x).toDouble }
      i += 1
    }
    i = 0
    while (i < bn && !nbNull) {
      if (b.isNullAt(i)) nbNull = true
      else { val y = b.getFloat(i); nb += (y * y).toDouble }
      i += 1
    }
    val dotNull = an != bn || naNull || nbNull
    var dot = 0.0d
    if (!dotNull) {
      i = 0
      while (i < an) {
        dot += (a.getFloat(i) * b.getFloat(i)).toDouble
        i += 1
      }
    }
    if (!naNull && !nbNull) {
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0d) 0.0d
      else if (dotNull) null
      else dot / d
    } else null
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
      val naNull = ctx.freshName("naNull")
      val nbNull = ctx.freshName("nbNull")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val dot = ctx.freshName("dot"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $an = $a.numElements();
         |final int $bn = $b.numElements();
         |boolean $naNull = false; boolean $nbNull = false;
         |double $na = 0.0; double $nb = 0.0; double $dot = 0.0;
         |for (int $i = 0; $i < $an && !$naNull; $i++) {
         |  if ($a.isNullAt($i)) { $naNull = true; }
         |  else { final float $x = $a.getFloat($i); $na += (double) ($x * $x); }
         |}
         |for (int $i = 0; $i < $bn && !$nbNull; $i++) {
         |  if ($b.isNullAt($i)) { $nbNull = true; }
         |  else { final float $y = $b.getFloat($i); $nb += (double) ($y * $y); }
         |}
         |if ($naNull || $nbNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($d == 0.0) {
         |    ${ev.value} = 0.0;
         |  } else if ($an != $bn) {
         |    ${ev.isNull} = true;
         |  } else {
         |    for (int $i = 0; $i < $an; $i++) {
         |      $dot += (double) ($a.getFloat($i) * $b.getFloat($i));
         |    }
         |    ${ev.value} = $dot / $d;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatCosine =
    copy(left = newLeft, right = newRight)
}

object FloatCosine {
  /** Cosine similarity of two `array<float>` columns (codegen'd single
    * pass; see [[FloatCosine]]). */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(FloatCosine(Bridge.expression(a), Bridge.expression(b)))
}
