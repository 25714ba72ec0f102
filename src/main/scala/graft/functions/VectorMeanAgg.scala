package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native component-wise mean of a fixed-dimension vector column
  * (`array<float>` or `array<double>`) — the k-means Lloyd-step aggregate.
  *
  * Exists for the IVF training path ([[graft.pipeline.Similarity.ivfTrain]]):
  * the declarative formulation (posexplode → avg per (cluster, pos) →
  * map_from_arrays) shuffles O(nlist·dim) rows and collects the centroids
  * as boxed `Map[Int, Double]` — at production scale (nlist 10⁵ × dim 1024)
  * several GB of boxed driver data per iteration. This aggregate keeps ONE
  * `double[dim+1]` buffer per group (sums + count), updates it in a tight
  * primitive loop, merges distributively (map-side partial aggregation
  * applies unchanged), and the driver receives exactly nlist rows of
  * primitive `array<double>` — O(nlist·dim) doubles, nothing boxed.
  *
  * Determinism note: double summation order follows partition merge order,
  * as with every floating-point aggregate (including the `avg` form this
  * replaces); equality with the declarative form is pinned to 1e-9 relative
  * tolerance in PipelineSpec.
  *
  * Empty groups (never produced by groupBy) evaluate to the zero vector —
  * the same value the declarative form's `getOrElse(0.0)` yielded.
  */
case class VectorMeanAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim >= 1, "dim must be >= 1")

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vector_mean needs array<float|double>, got $other")
  }

  /** sums[0..dim-1] ++ count at slot dim. */
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dim + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val ad = v.asInstanceOf[ArrayData]
      require(ad.numElements() == dim,
        s"vector_mean(dim=$dim) saw a ${ad.numElements()}-element vector")
      // Null ELEMENTS are rejected loudly: ArrayData's primitive getters
      // would read them as 0.0, silently diverging from the per-component
      // null-skipping a declarative avg does. NULL VECTORS are skipped
      // (standard aggregate null semantics, same as the posexplode form).
      var i = 0
      if (elemIsFloat) while (i < dim) {
        require(!ad.isNullAt(i),
          s"vector_mean saw a null element at position $i")
        buf(i) += ad.getFloat(i); i += 1
      }
      else while (i < dim) {
        require(!ad.isNullAt(i),
          s"vector_mean saw a null element at position $i")
        buf(i) += ad.getDouble(i); i += 1
      }
      buf(dim) += 1d
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    val n = buf(dim)
    val out = new Array[Double](dim)
    if (n > 0d) {
      var i = 0
      while (i < dim) { out(i) = buf(i) / n; i += 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (dim + 1))
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim + 1)(bb.getDouble())
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "vector_mean"

  override def withNewMutableAggBufferOffset(offset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMeanAgg =
    copy(child = newChildren.head)
}

object VectorMeanAgg {
  /** Aggregate column: component-wise mean (`array<double>` of length
    * `dim`) of a fixed-dimension vector column. */
  def vectorMean(vec: Column, dim: Int): Column =
    Bridge.column(VectorMeanAgg(Bridge.expression(vec), dim)
      .toAggregateExpression())
}
