package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the Z-ORDER (Morton) value of a row over k
  * normalized coordinates — the ordering kernel behind
  * [[graft.write.TableMaintenance.zorderLayout]].
  *
  * Each child is a DOUBLE coordinate; `boundaries(i)` is that coordinate's
  * sorted quantile cut points (computed once, driver-side, from an
  * approx-quantile sketch — metadata-sized). Per row, each coordinate is
  * bucketed by binary search (bucket = #boundaries ≤ value, so quantile
  * cuts give equi-populated buckets regardless of skew), then the bucket
  * ids' bits are interleaved MSB-first into one long:
  * `z = … b0[msb] b1[msb] … b0[lsb] b1[lsb]`. Sorting by `z` places rows
  * close in EVERY coordinate near each other — after the layout rewrite,
  * parquet row-group min/max ranges are narrow on ALL z-ordered columns
  * simultaneously, so range predicates on any of them prune row groups
  * (a lexicographic sort only serves its leading column).
  *
  * One codegen'd pass, no allocation: k binary searches over
  * driver-broadcast double arrays + a shift/or loop. Null coordinates take
  * bucket 0 (nulls-first placement); output is never null. NaN buckets
  * last (Java double ordering) — deterministic. Evaluated once per row in
  * a REWRITE job only; never in a query path.
  */
case class ZValue(children: Seq[Expression], boundaries: Seq[Array[Double]])
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zvalue"

  /** Bits per coordinate: wide enough for the largest bucket id (uniform
    * across coordinates so the interleave is positionally regular). */
  private[functions] val bits: Int = math.max(1,
    boundaries.map(b => 32 - Integer.numberOfLeadingZeros(
      math.max(b.length, 1))).max)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs ≥ 1 coordinate")
    else if (boundaries.length != children.length)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: ${children.length} coordinates but " +
          s"${boundaries.length} boundary sets")
    else if (!children.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires double coordinates, got " +
          children.map(_.dataType.catalogString).mkString(", "))
    else if (bits * children.length > 63)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: $bits bits × ${children.length} coordinates " +
          "exceeds 63 — use fewer columns or fewer buckets")
    else TypeCheckResult.TypeCheckSuccess

  /** bucket = #boundaries ≤ v (insertion point of the binary search). */
  private def bucketOf(bounds: Array[Double], v: Double): Int = {
    val idx = java.util.Arrays.binarySearch(bounds, v)
    if (idx >= 0) idx + 1 else -idx - 1
  }

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val bks = new Array[Int](n)
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      bks(c) = if (v == null) 0
        else bucketOf(boundaries(c), v.asInstanceOf[Double])
      c += 1
    }
    var z = 0L
    var bit = bits - 1
    while (bit >= 0) {
      c = 0
      while (c < n) {
        z = (z << 1) | ((bks(c) >>> bit) & 1L)
        c += 1
      }
      bit -= 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
    val boundsRef = ctx.addReferenceObj("zbounds", boundaries.toArray,
      "double[][]")
    val z = ctx.freshName("zval")
    val bit = ctx.freshName("bit")
    val evals = children.zipWithIndex.map { case (child, i) =>
      (child.genCode(ctx), ctx.freshName(s"bk$i"), ctx.freshName(s"idx$i"), i)
    }
    val bucketCode = evals.map { case (cev, b, idx, i) =>
      code"""
         |${cev.code}
         |int $b = 0;
         |if (!${cev.isNull}) {
         |  final int $idx =
         |    java.util.Arrays.binarySearch($boundsRef[$i], ${cev.value});
         |  $b = $idx >= 0 ? $idx + 1 : -$idx - 1;
         |}
       """.stripMargin
    }.reduce(_ + _)
    val interleave = evals.map { case (_, b, _, _) =>
      s"$z = ($z << 1) | (($b >>> $bit) & 1L);"
    }.mkString("\n")
    ev.copy(code = bucketCode +
      code"""
         |long $z = 0L;
         |for (int $bit = $bits - 1; $bit >= 0; $bit--) {
         |  $interleave
         |}
       """.stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(z, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue =
    copy(children = newChildren)
}

object ZValue {
  /** Z-value column over already-normalized double coordinates with the
    * given per-coordinate quantile boundaries. */
  def zvalue(coords: Seq[Column], boundaries: Seq[Array[Double]]): Column =
    Bridge.column(ZValue(coords.map(Bridge.expression), boundaries))
}
