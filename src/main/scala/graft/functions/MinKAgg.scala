package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded k-SMALLEST (id ASC) rows of (id long, tag int) per group —
  * the partial-aggregating replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY id ASC) <= k` bucket-cap
  * idiom (Dedup.capBuckets): the window form ships EVERY row of a hot
  * bucket to one reducer and sorts it just to keep the first k, while a
  * TypedImperativeAggregate gets map-side COMBINE — each map partition
  * emits at most k rows per group, so a bucket duplicated millions of
  * times costs the exchange ≤ k rows per mapper instead of its full
  * occupancy (the same argument as [[TopKAgg]] vs the rank window,
  * measured there in SOAK_r13).
  *
  * `tag` is an opaque payload that rides with its id (the sign-LSH
  * multi-probe home/probe flag); ordering and the cap are by id ALONE —
  * bit-identical to the window form's `orderBy(id asc)` (callers
  * guarantee ids are unique within a group, so the order is total and
  * the kept set deterministic).
  *
  * Buffer: a capacity-k binary max-heap on id (largest kept id at the
  * root) — O(log k) per update once full. Output:
  * `array<struct<id:long, p:int>>` sorted id ASC. */
case class MinKAgg(
    id: Expression,
    tag: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKAgg.Buf] {

  require(k >= 1, s"min-k needs k >= 1 (got $k)")

  override def createAggregationBuffer(): MinKAgg.Buf = new MinKAgg.Buf(k)

  override def update(buf: MinKAgg.Buf, input: InternalRow): MinKAgg.Buf = {
    val i = id.eval(input)
    val t = tag.eval(input)
    if (i != null && t != null)
      buf.offer(i.asInstanceOf[Long], t.asInstanceOf[Int])
    buf
  }

  override def merge(b1: MinKAgg.Buf, b2: MinKAgg.Buf): MinKAgg.Buf = {
    var i = 0
    while (i < b2.size) { b1.offer(b2.ids(i), b2.tags(i)); i += 1 }
    b1
  }

  override def eval(buf: MinKAgg.Buf): Any = {
    val idx = Array.range(0, buf.size)
      .sortBy(i => buf.ids(i))
    new GenericArrayData(idx.map(i => InternalRow(buf.ids(i),
      buf.tags(i)): Any))
  }

  override def serialize(buf: MinKAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 12 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.ids(i)); bb.putInt(buf.tags(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new MinKAgg.Buf(k)
    var i = 0
    while (i < n) {
      val id = bb.getLong(); val t = bb.getInt()
      buf.offer(id, t)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("p", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(id, tag)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (id.dataType == LongType && tag.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (id BIGINT, tag INT), got " +
        s"(${id.dataType.simpleString}, ${tag.dataType.simpleString})")
  }
  override def prettyName: String = "min_k_ids"

  override def withNewMutableAggBufferOffset(offset: Int): MinKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKAgg =
    copy(id = newChildren(0), tag = newChildren(1))
}

object MinKAgg {

  /** Capacity-k max-heap on id: largest kept id at the root. */
  final class Buf(val k: Int) {
    var ids = new Array[Long](math.min(k, 16))
    var tags = new Array[Int](math.min(k, 16))
    var size = 0

    def offer(i: Long, t: Int): Unit = {
      if (size < k) {
        if (size == ids.length) {
          val cap = math.min(k.toLong, ids.length * 2L).toInt
          ids = java.util.Arrays.copyOf(ids, cap)
          tags = java.util.Arrays.copyOf(tags, cap)
        }
        ids(size) = i; tags(size) = t; size += 1
        var c = size - 1 // sift up
        while (c > 0 && ids(c) > ids((c - 1) / 2)) {
          val p = (c - 1) / 2
          val (ti, tt) = (ids(c), tags(c))
          ids(c) = ids(p); tags(c) = tags(p)
          ids(p) = ti; tags(p) = tt
          c = p
        }
      } else if (i < ids(0)) {
        ids(0) = i; tags(0) = t // replace the largest, sift down
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1
          val r = l + 1
          var w = p
          if (l < size && ids(l) > ids(w)) w = l
          if (r < size && ids(r) > ids(w)) w = r
          if (w == p) done = true
          else {
            val (ti, tt) = (ids(p), tags(p))
            ids(p) = ids(w); tags(p) = tags(w)
            ids(w) = ti; tags(w) = tt
            p = w
          }
        }
      }
    }
  }

  /** Aggregate column: the k smallest-id (id, tag) rows of the group as
    * `array<struct<id, p>>` sorted id ASC, map-side combined. */
  def minK(id: Column, tag: Column, k: Int): Column =
    Bridge.column(MinKAgg(Bridge.expression(id.cast("long")),
      Bridge.expression(tag.cast("int")), k).toAggregateExpression())
}
