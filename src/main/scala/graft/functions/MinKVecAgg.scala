package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded k-SMALLEST rows by (key ASC, id ASC) per group, each carrying
  * an `array<float>` payload — the partial-aggregating replacement for
  * the `row_number() OVER (PARTITION BY s ORDER BY key, id) <= k`
  * seeded-init pick in [[graft.pipeline.Similarity.pqTrain]].
  *
  * The window form has exactly m (= subspace count) rank partitions, so
  * the init pick funnels the WHOLE exploded training sample through m
  * reducers and sorts it just to keep the first ksub rows per subspace.
  * A TypedImperativeAggregate gets map-side COMBINE: each map partition
  * emits at most k rows per subspace, so the exchange carries
  * m × k × #map-partitions rows worst case (vs the full sample) and no
  * sort — the same argument as [[MinKAgg]]/[[TopKAgg]] vs their windows.
  *
  * Ordering is lexicographic (key ASC, id ASC) — callers guarantee ids
  * are unique within a group, so the order is total and the kept set
  * deterministic, bit-identical to the window form's
  * `orderBy(key, id)` pick. A null payload rides along untouched (the
  * window form ranks rows regardless of payload nullity); null key/id
  * rows are skipped (standard aggregate null semantics — the callers'
  * hash/id expressions are never null by construction).
  *
  * Buffer: capacity-k binary max-heap on (key, id) (largest kept pair at
  * the root) — O(log k) per update once full. Output:
  * `array<array<float>>` sorted (key ASC, id ASC) — element i is the
  * payload of the rank-(i+1) row. */
case class MinKVecAgg(
    key: Expression,
    id: Expression,
    vec: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKVecAgg.Buf] {

  require(k >= 1, s"min-k needs k >= 1 (got $k)")

  override def createAggregationBuffer(): MinKVecAgg.Buf =
    new MinKVecAgg.Buf(k)

  override def update(buf: MinKVecAgg.Buf, input: InternalRow): MinKVecAgg.Buf = {
    val h = key.eval(input)
    val i = id.eval(input)
    if (h != null && i != null) {
      val v = vec.eval(input)
      val arr =
        if (v == null) null
        else {
          val ad = v.asInstanceOf[ArrayData]
          // Null-element check (r18, advisory): toFloatArray() NPEs on a
          // GenericArrayData null slot and silently reads 0.0 from an
          // UnsafeArrayData one, while the output type declares
          // containsNull = false — reject loudly instead (the callers'
          // embedding contract forbids null elements).
          var j = 0
          val n = ad.numElements()
          while (j < n) {
            if (ad.isNullAt(j)) throw new IllegalArgumentException(
              s"$prettyName: vec contains a null element at index $j " +
                "(embedding arrays must be null-free)")
            j += 1
          }
          ad.toFloatArray()
        }
      buf.offer(h.asInstanceOf[Long], i.asInstanceOf[Long], arr)
    }
    buf
  }

  override def merge(b1: MinKVecAgg.Buf, b2: MinKVecAgg.Buf): MinKVecAgg.Buf = {
    var i = 0
    while (i < b2.size) { b1.offer(b2.keys(i), b2.ids(i), b2.vecs(i)); i += 1 }
    b1
  }

  override def eval(buf: MinKVecAgg.Buf): Any = {
    val idx = Array.range(0, buf.size).sortWith { (a, b) =>
      if (buf.keys(a) != buf.keys(b)) buf.keys(a) < buf.keys(b)
      else buf.ids(a) < buf.ids(b)
    }
    new GenericArrayData(idx.map { i =>
      val v = buf.vecs(i)
      (if (v == null) null else new GenericArrayData(v)): Any
    })
  }

  override def serialize(buf: MinKVecAgg.Buf): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < buf.size) {
      bytes += 20 + (if (buf.vecs(i) == null) 0 else 4 * buf.vecs(i).length)
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putLong(buf.keys(i)); bb.putLong(buf.ids(i))
      val v = buf.vecs(i)
      if (v == null) bb.putInt(-1)
      else {
        bb.putInt(v.length)
        var j = 0
        while (j < v.length) { bb.putFloat(v(j)); j += 1 }
      }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKVecAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new MinKVecAgg.Buf(k)
    var i = 0
    while (i < n) {
      val h = bb.getLong(); val id = bb.getLong()
      val len = bb.getInt()
      val v =
        if (len < 0) null
        else {
          val a = new Array[Float](len)
          var j = 0
          while (j < len) { a(j) = bb.getFloat(); j += 1 }
          a
        }
      buf.offer(h, id, v)
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    ArrayType(ArrayType(FloatType, containsNull = false),
      containsNull = true)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, id, vec)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (key.dataType == LongType && id.dataType == LongType && vecOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (key BIGINT, id BIGINT, vec ARRAY<FLOAT>), got " +
        s"(${key.dataType.simpleString}, ${id.dataType.simpleString}, " +
        s"${vec.dataType.simpleString})")
  }
  override def prettyName: String = "min_k_vecs"

  override def withNewMutableAggBufferOffset(offset: Int): MinKVecAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinKVecAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKVecAgg =
    copy(key = newChildren(0), id = newChildren(1), vec = newChildren(2))
}

object MinKVecAgg {

  /** Capacity-k max-heap on (key, id): largest kept pair at the root. */
  final class Buf(val k: Int) {
    var keys = new Array[Long](math.min(k, 16))
    var ids = new Array[Long](math.min(k, 16))
    var vecs = new Array[Array[Float]](math.min(k, 16))
    var size = 0

    private def gt(ka: Long, ia: Long, kb: Long, ib: Long): Boolean =
      if (ka != kb) ka > kb else ia > ib

    def offer(h: Long, i: Long, v: Array[Float]): Unit = {
      if (size < k) {
        if (size == keys.length) {
          val cap = math.min(k.toLong, keys.length * 2L).toInt
          keys = java.util.Arrays.copyOf(keys, cap)
          ids = java.util.Arrays.copyOf(ids, cap)
          vecs = java.util.Arrays.copyOf(vecs, cap)
        }
        keys(size) = h; ids(size) = i; vecs(size) = v; size += 1
        var c = size - 1 // sift up
        while (c > 0 && gt(keys(c), ids(c), keys((c - 1) / 2), ids((c - 1) / 2))) {
          val p = (c - 1) / 2
          val (tk, ti, tv) = (keys(c), ids(c), vecs(c))
          keys(c) = keys(p); ids(c) = ids(p); vecs(c) = vecs(p)
          keys(p) = tk; ids(p) = ti; vecs(p) = tv
          c = p
        }
      } else if (gt(keys(0), ids(0), h, i)) {
        keys(0) = h; ids(0) = i; vecs(0) = v // replace the largest, sift down
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1
          val r = l + 1
          var w = p
          if (l < size && gt(keys(l), ids(l), keys(w), ids(w))) w = l
          if (r < size && gt(keys(r), ids(r), keys(w), ids(w))) w = r
          if (w == p) done = true
          else {
            val (tk, ti, tv) = (keys(p), ids(p), vecs(p))
            keys(p) = keys(w); ids(p) = ids(w); vecs(p) = vecs(w)
            keys(w) = tk; ids(w) = ti; vecs(w) = tv
            p = w
          }
        }
      }
    }
  }

  /** Aggregate column: the payloads of the k (key ASC, id ASC)-smallest
    * rows of the group as `array<array<float>>` in rank order, map-side
    * combined. */
  def minKVecs(key: Column, id: Column, vec: Column, k: Int): Column =
    Bridge.column(MinKVecAgg(Bridge.expression(key.cast("long")),
      Bridge.expression(id.cast("long")), Bridge.expression(vec),
      k).toAggregateExpression())
}
