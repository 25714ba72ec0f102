package graft.functions

import graft.format.Bloom
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native bloom-bitset aggregate: over a group's stream of STRING values
  * (the writer casts tracked columns to their canonical string rendering,
  * the same form the min/max stats store), sets each value's k seeded
  * xxhash64 bits in one `(k | bitset)` payload — the per-file bloom of the
  * metadata skipping index, built INSIDE the slice writer's existing
  * one-job stats aggregate.
  *
  * Distributive: update is bit-set, merge is bitwise OR — map-side partial
  * aggregation applies unchanged, the driver receives one payload per
  * (partition, fileId) group. Buffer is the payload itself (serialize =
  * identity), so shuffle cost is the raw bitset — deflate compression
  * happens once, driver-side, at commit-JSON encode time
  * ([[Bloom.encode]]). Nulls are skipped (a bloom answers value
  * membership; null-ness is the null-count stat's job).
  */
case class BloomAgg(
    child: Expression,
    bits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def createAggregationBuffer(): Array[Byte] =
    Bloom.empty(bits, numHashes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    Bloom.merge(b1, b2)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bloom"

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {
  /** Aggregate column: the `(k | bitset)` bloom payload of a string
    * column's non-null values. */
  def bloom(value: Column, bits: Int, numHashes: Int): Column =
    Bridge.column(BloomAgg(Bridge.expression(value), bits, numHashes)
      .toAggregateExpression())
}
