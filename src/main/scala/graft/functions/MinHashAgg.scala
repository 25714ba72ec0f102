package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native MinHash-signature aggregate: over a group's stream of shingle
  * hashes, computes `sig[h] = min over shingles of XXH64(shingle, seed=h)`
  * for `numHashes` seeded hash functions — the signature arrives as ONE
  * `array<bigint>` column from ONE aggregate.
  *
  * Exists as the custom-aggregate counterpart of [[LongArrayDot]]
  * (SURVEY.md §7.4: "MinHash signatures — custom Aggregator, no built-in"):
  * the same signature via k separate `min(xxhash64(sh, h))` columns works,
  * but plans k aggregate expressions whose generated update code grows with
  * k; the typed buffer keeps one `long[k]` per group, updates it in a tight
  * loop, and merges distributively (elementwise min) — map-side partial
  * aggregation applies unchanged.
  *
  * Determinism: pure function of the input VALUE SET (min is commutative/
  * associative/idempotent), so row order and partitioning never matter.
  * Empty groups yield Long.MaxValue sentinels (callers group by doc id over
  * a non-empty shingle stream, so this does not arise in practice).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sh = v.asInstanceOf[Long]
      var h = 0
      while (h < numHashes) {
        val x = XXH64.hashLong(sh, h)
        if (x < buf(h)) buf(h) = x
        h += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var h = 0
    while (h < numHashes) {
      if (b2(h) < b1(h)) b1(h) = b2(h)
      h += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_sig"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Aggregate column: MinHash signature (array of `numHashes` mins) of a
    * bigint shingle-hash column. */
  def minhashSig(shingleHash: Column, numHashes: Int): Column =
    Bridge.column(MinHashAgg(Bridge.expression(shingleHash), numHashes)
      .toAggregateExpression())
}
