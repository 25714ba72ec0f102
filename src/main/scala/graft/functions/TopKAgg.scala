package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k of (score double, id long) pairs per group, ordered
  * (score DESC, id ASC) — the partial-aggregating replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC) <= k`
  * idiom on paths where the WINDOW EXCHANGE is the dominant shuffle.
  *
  * Spark 4's WindowGroupLimit already prunes each map partition to its
  * local top-k per group BEFORE the rank exchange — but that still ships
  * groups × k × #map-partitions rows (the kNN join's final rank moved
  * more bytes through that exchange than the candidate join itself,
  * measured in SOAK_r13). A TypedImperativeAggregate gets map-side
  * COMBINE: each map partition emits ONE buffer per group (the k pairs,
  * merged distributively), so the exchange carries groups × k pairs
  * total, independent of partition count.
  *
  * Buffer: a capacity-k binary heap with the WORST pair at the root
  * (min-heap under (score ASC, id DESC)) — O(log k) per update once
  * full, O(k log k) sort only at eval. Ordering uses
  * `java.lang.Double.compare`, matching Spark's fp total order
  * (NaN > +Inf) so results are bit-identical to the window form
  * (equality spec-pinned in PipelineSpec). Rows with a null score or id
  * are skipped (standard aggregate null semantics; the callers'
  * score expressions are never null by construction).
  *
  * Output: `array<struct<id:long, score:double>>` sorted (score DESC,
  * id ASC) — `posexplode` yields (rank − 1, pair). */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k >= 1, s"top-k needs k >= 1 (got $k)")

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKAgg.Buf, b2: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < b2.size) { b1.offer(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val idx = Array.range(0, buf.size).sortWith { (a, b) =>
      val c = TopKAgg.cmpScore(buf.scores(a), buf.scores(b))
      if (c != 0) c > 0 else buf.ids(a) < buf.ids(b)
    }
    new GenericArrayData(idx.map(i => InternalRow(buf.ids(i),
      buf.scores(i)): Any))
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKAgg.Buf(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  // analysis-time typing (ExpectsInputTypes is out of reach —
  // AbstractDataType is private[sql]): update() casts eval results
  // directly, so a float score or int id child would otherwise surface
  // as a runtime ClassCastException mid-job instead of an
  // AnalysisException at planning; the [[TopKAgg.topK]] builder also
  // casts, so only direct Expression construction can get here
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (score DOUBLE, id BIGINT), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
  }
  override def prettyName: String = "top_k_pairs"

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Spark SQL's fp total order: NaN greater than everything AND
    * −0.0 == 0.0 (`SQLOrderingUtil` semantics — raw `Double.compare`
    * would rank −0.0 below 0.0 and silently diverge from the window
    * form on zero-score ties; TopKAggProps pins the equality). */
  private[graft] def cmpScore(a: Double, b: Double): Int =
    java.lang.Double.compare(
      if (a == 0.0d) 0.0d else a,
      if (b == 0.0d) 0.0d else b)

  /** Capacity-k heap, WORST pair at the root: a is worse than b iff
    * (score_a < score_b) under Spark's fp total order, ties by
    * id_a > id_b. */
  final class Buf(val k: Int) {
    var scores = new Array[Double](math.min(k, 16))
    var ids = new Array[Long](math.min(k, 16))
    var size = 0

    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = cmpScore(sa, sb)
      if (c != 0) c < 0 else ia > ib
    }

    def offer(s: Double, i: Long): Unit = {
      if (size < k) {
        if (size == scores.length) {
          val cap = math.min(k.toLong, scores.length * 2L).toInt
          scores = java.util.Arrays.copyOf(scores, cap)
          ids = java.util.Arrays.copyOf(ids, cap)
        }
        scores(size) = s; ids(size) = i; size += 1
        var c = size - 1 // sift up
        while (c > 0 && worse(scores(c), ids(c),
            scores((c - 1) / 2), ids((c - 1) / 2))) {
          val p = (c - 1) / 2
          val (ts, ti) = (scores(c), ids(c))
          scores(c) = scores(p); ids(c) = ids(p)
          scores(p) = ts; ids(p) = ti
          c = p
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i // replace the worst, sift down
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1
          val r = l + 1
          var w = p
          if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
          if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
          if (w == p) done = true
          else {
            val (ts, ti) = (scores(p), ids(p))
            scores(p) = scores(w); ids(p) = ids(w)
            scores(w) = ts; ids(w) = ti
            p = w
          }
        }
      }
    }
  }

  /** Aggregate column: the k (score DESC, id ASC)-first pairs of the
    * group as `array<struct<id, score>>`, map-side combined. */
  def topK(score: Column, id: Column, k: Int): Column =
    // casts make Column-level misuse (float score, int id) WORK rather
    // than fail: cast-to-same-type is a no-op for the intended callers,
    // and checkInputDataTypes still rejects direct Expression misuse
    Bridge.column(TopKAgg(Bridge.expression(score.cast("double")),
      Bridge.expression(id.cast("long")), k).toAggregateExpression())
}
