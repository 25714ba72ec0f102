package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Σ x·yᵀ over two fixed-dimension vector columns, as ONE flat
  * row-major `array<double>` of length dimX·dimY — the OPQ Procrustes
  * aggregate ([[graft.pipeline.Similarity.opqTrain]] needs A = Σ x·x̂ᵀ).
  *
  * Exists because the declarative form — `flatten(transform(x, xi =>
  * transform(y, yj => xi*yj)))` into [[VectorMeanAgg]] — MATERIALIZES a
  * dimX·dimY-element array per input row (4096 doubles at dim 64; ~16 M
  * allocations over a 60 k-row training set) before the aggregate ever
  * sees it. This aggregate keeps one primitive `double[dimX·dimY]`
  * buffer, accumulates the outer product in a tight two-level loop with
  * ZERO per-row allocation, and merges distributively (map-side partial
  * aggregation applies unchanged) — the shuffle still carries one
  * dim²-double row total.
  *
  * Null VECTORS on either side skip the row (standard aggregate null
  * semantics); null ELEMENTS are rejected loudly (primitive getters would
  * silently read 0.0). Determinism matches every floating-point
  * aggregate: summation follows partition merge order; equality with the
  * declarative form is tolerance-pinned in PipelineSpec.
  */
case class OuterSumAgg(
    x: Expression,
    y: Expression,
    dimX: Int,
    dimY: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dimX >= 1 && dimY >= 1, "dims must be >= 1")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"outer_sum needs array<float|double>, got $other")
  }
  private lazy val xFloat = isFloat(x)
  private lazy val yFloat = isFloat(y)

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dimX * dimY)

  private def read(ad: ArrayData, dim: Int, float: Boolean, side: String)
      : Array[Double] = {
    require(ad.numElements() == dim,
      s"outer_sum($side dim=$dim) saw a ${ad.numElements()}-element vector")
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      require(!ad.isNullAt(i),
        s"outer_sum saw a null $side element at position $i")
      out(i) = if (float) ad.getFloat(i) else ad.getDouble(i)
      i += 1
    }
    out
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null) {
      val xs = read(xv.asInstanceOf[ArrayData], dimX, xFloat, "left")
      val ys = read(yv.asInstanceOf[ArrayData], dimY, yFloat, "right")
      var i = 0
      while (i < dimX) {
        val xi = xs(i)
        val base = i * dimY
        var j = 0
        while (j < dimY) { buf(base + j) += xi * ys(j); j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dimX * dimY)(bb.getDouble())
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(x, y)
  override def prettyName: String = "outer_sum"

  override def withNewMutableAggBufferOffset(offset: Int): OuterSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): OuterSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OuterSumAgg =
    copy(x = newChildren(0), y = newChildren(1))
}

object OuterSumAgg {
  /** Aggregate column: Σ x·yᵀ as a flat row-major `array<double>` of
    * length dimX·dimY. */
  def outerSum(x: Column, y: Column, dimX: Int, dimY: Int): Column =
    Bridge.column(OuterSumAgg(Bridge.expression(x), Bridge.expression(y),
      dimX, dimY).toAggregateExpression())
}
