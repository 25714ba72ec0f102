package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native SimHash aggregate over a group's stream of token hashes: per bit
  * b of the `bits`-wide input hash, accumulates a ±1 vote (`+1` if the bit
  * is set), and evaluates to the simhash — the long whose bit b is set iff
  * the vote sum is positive. Replaces `bits` separate
  * `sum(CASE WHEN ...)` aggregate columns with one `long[bits]` buffer
  * updated in a tight loop; merge is elementwise addition (distributive —
  * map-side partial aggregation applies).
  *
  * The semantics mirror the SQL oracle exactly (see
  * SparkEntry.SimhashSql): votes are +1/-1, ties (sum == 0) leave the bit
  * clear. Keep `bits <= 60` so the result stays positive in a signed
  * BIGINT on every engine. */
case class SimHashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 1 && bits <= 60, "bits must be in [1, 60]")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (((h >>> b) & 1L) * 2L) - 1L
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var b = 0
    while (b < bits) { b1(b) += b2(b); b += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "simhash_agg"

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Aggregate column: `bits`-wide simhash of a bigint token-hash column. */
  def simhash(tokenHash: Column, bits: Int): Column =
    Bridge.column(SimHashAgg(Bridge.expression(tokenHash), bits)
      .toAggregateExpression())
}
