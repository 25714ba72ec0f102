package graft.functions

import java.nio.ByteBuffer
import java.util.{TreeMap => JTreeMap}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Exact, MERGEABLE distinct-count over 64-bit keys — the scale substitute
  * for `COUNT(DISTINCT x)`.
  *
  * Why it exists (SURVEY §2.1 "training-data pipeline ops"): exact
  * `COUNT(DISTINCT)` is not an algebraic aggregate — Spark plans it as an
  * Expand + two-phase shuffle of the RAW distinct values, and the result is
  * a number you cannot re-aggregate (yesterday's per-partition distinct
  * counts do not add). A compressed bitmap IS the mergeable form: per-group
  * (or per-partition, per-day) bitmaps union losslessly, so rollups across
  * any dimension reuse stored partials instead of rescanning raw data —
  * at 100 TB the difference between re-reading a year of events and OR-ing
  * 365 small binaries. Map-side partial aggregation applies unchanged
  * (union is commutative/associative/idempotent).
  *
  * Encoding: 64-bit roaring-style two-level structure. A key `v` lands in
  * container `v >>> 16` (48-bit high part); each container covers a 2^16
  * slot space and is either a sorted array of 16-bit slots (≤ 4096
  * entries) or a 1024-word bit set (8 KiB) beyond that — the same
  * array/bitmap crossover as RoaringBitmap (Chambi et al., "Better bitmap
  * performance with Roaring bitmaps", 2016), reimplemented here because no
  * such dependency is available and the format must stay self-contained.
  *
  * Serialization is CANONICAL: containers in ascending high-part order,
  * each serialized as a sorted slot array when ≤ 4096 entries and as the
  * bit set otherwise, regardless of in-memory form. Two bitmaps over the
  * same value set serialize to identical bytes whatever insert/merge order
  * produced them — so stored bitmap columns (maintained views, per-day
  * partials) are deterministic and safely comparable/hashable.
  */
object Bitmap64 {

  /** In-memory form: high-part -> container. Containers are
    * `Array[Char]` (sorted slots, unsigned 16-bit) or `Array[Long]`
    * (1024-word bit set). TreeMap keeps canonical order for free. */
  type Bitmap = JTreeMap[Long, AnyRef]

  val ArrayMax = 4096
  private val BitmapWords = 1024

  def empty(): Bitmap = new JTreeMap[Long, AnyRef]()

  def add(bm: Bitmap, v: Long): Unit = {
    val high = v >>> 16
    val slot = (v & 0xffffL).toChar
    bm.get(high) match {
      case null =>
        bm.put(high, Array(slot))
      case arr: Array[Char] =>
        val idx = java.util.Arrays.binarySearch(arr, slot)
        if (idx < 0) {
          val ins = -idx - 1
          if (arr.length >= ArrayMax) {
            bm.put(high, toBitmapContainer(arr, slot))
          } else {
            val out = new Array[Char](arr.length + 1)
            System.arraycopy(arr, 0, out, 0, ins)
            out(ins) = slot
            System.arraycopy(arr, ins, out, ins + 1, arr.length - ins)
            bm.put(high, out)
          }
        }
      case words: Array[Long] =>
        words(slot >>> 6) |= (1L << (slot & 63))
    }
  }

  private def toBitmapContainer(arr: Array[Char], extra: Char): Array[Long] = {
    val words = new Array[Long](BitmapWords)
    var i = 0
    while (i < arr.length) {
      val s = arr(i); words(s >>> 6) |= (1L << (s & 63)); i += 1
    }
    words(extra >>> 6) |= (1L << (extra & 63))
    words
  }

  private def containerCount(c: AnyRef): Int = c match {
    case arr: Array[Char] => arr.length
    case words: Array[Long] =>
      var n = 0; var i = 0
      while (i < BitmapWords) { n += java.lang.Long.bitCount(words(i)); i += 1 }
      n
  }

  /** Union `other` into `into` (mutates and returns `into`). */
  def merge(into: Bitmap, other: Bitmap): Bitmap = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = into.get(e.getKey)
      if (mine == null) into.put(e.getKey, copyContainer(e.getValue))
      else into.put(e.getKey, unionContainers(mine, e.getValue))
    }
    into
  }

  private def copyContainer(c: AnyRef): AnyRef = c match {
    case arr: Array[Char] => arr.clone()
    case words: Array[Long] => words.clone()
  }

  private def unionContainers(a: AnyRef, b: AnyRef): AnyRef = (a, b) match {
    case (x: Array[Char], y: Array[Char]) =>
      // Merge two sorted slot arrays; spill to a bit set past the crossover.
      val out = new Array[Char](x.length + y.length)
      var i = 0; var j = 0; var n = 0
      while (i < x.length && j < y.length) {
        val u = x(i); val v = y(j)
        if (u == v) { out(n) = u; i += 1; j += 1 }
        else if (u < v) { out(n) = u; i += 1 }
        else { out(n) = v; j += 1 }
        n += 1
      }
      while (i < x.length) { out(n) = x(i); i += 1; n += 1 }
      while (j < y.length) { out(n) = y(j); j += 1; n += 1 }
      if (n > ArrayMax) {
        val words = new Array[Long](BitmapWords)
        var k = 0
        while (k < n) { val s = out(k); words(s >>> 6) |= (1L << (s & 63)); k += 1 }
        words
      } else java.util.Arrays.copyOf(out, n)
    case (words: Array[Long], arr: Array[Char]) =>
      var i = 0
      while (i < arr.length) { val s = arr(i); words(s >>> 6) |= (1L << (s & 63)); i += 1 }
      words
    case (arr: Array[Char], words: Array[Long]) =>
      unionContainers(words.clone(), arr)
    case (x: Array[Long], y: Array[Long]) =>
      var i = 0
      while (i < BitmapWords) { x(i) |= y(i); i += 1 }
      x
  }

  /** Intersection (fresh bitmap; inputs untouched). With [[merge]] and
    * [[andNot]] this closes the set algebra over stored partials — the
    * exact form of "users active in BOTH periods" / retention cohorts. */
  def intersect(a: Bitmap, b: Bitmap): Bitmap = {
    val out = empty()
    val it = a.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val other = b.get(e.getKey)
      if (other != null) {
        val c = intersectContainers(e.getValue, other)
        if (containerCount(c) > 0) out.put(e.getKey, c)
      }
    }
    out
  }

  private def intersectContainers(a: AnyRef, b: AnyRef): AnyRef = (a, b) match {
    case (x: Array[Char], y: Array[Char]) =>
      val out = new Array[Char](math.min(x.length, y.length))
      var i = 0; var j = 0; var n = 0
      while (i < x.length && j < y.length) {
        val u = x(i); val v = y(j)
        if (u == v) { out(n) = u; n += 1; i += 1; j += 1 }
        else if (u < v) i += 1
        else j += 1
      }
      java.util.Arrays.copyOf(out, n)
    case (arr: Array[Char], words: Array[Long]) =>
      arr.filter(s => (words(s >>> 6) & (1L << (s & 63))) != 0L)
    case (words: Array[Long], arr: Array[Char]) =>
      intersectContainers(arr, words)
    case (x: Array[Long], y: Array[Long]) =>
      val out = new Array[Long](BitmapWords)
      var i = 0
      while (i < BitmapWords) { out(i) = x(i) & y(i); i += 1 }
      out
  }

  /** Difference a \ b (fresh bitmap; inputs untouched). */
  def andNot(a: Bitmap, b: Bitmap): Bitmap = {
    val out = empty()
    val it = a.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val other = b.get(e.getKey)
      val c =
        if (other == null) copyContainer(e.getValue)
        else andNotContainers(e.getValue, other)
      if (containerCount(c) > 0) out.put(e.getKey, c)
    }
    out
  }

  private def andNotContainers(a: AnyRef, b: AnyRef): AnyRef = (a, b) match {
    case (x: Array[Char], y: Array[Char]) =>
      val out = new Array[Char](x.length)
      var i = 0; var j = 0; var n = 0
      while (i < x.length) {
        val u = x(i)
        while (j < y.length && y(j) < u) j += 1
        if (j >= y.length || y(j) != u) { out(n) = u; n += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(out, n)
    case (arr: Array[Char], words: Array[Long]) =>
      arr.filter(s => (words(s >>> 6) & (1L << (s & 63))) == 0L)
    case (words: Array[Long], arr: Array[Char]) =>
      val out = words.clone()
      var i = 0
      while (i < arr.length) {
        val s = arr(i); out(s >>> 6) &= ~(1L << (s & 63)); i += 1
      }
      out
    case (x: Array[Long], y: Array[Long]) =>
      val out = new Array[Long](BitmapWords)
      var i = 0
      while (i < BitmapWords) { out(i) = x(i) & ~y(i); i += 1 }
      out
  }

  def cardinality(bm: Bitmap): Long = {
    var n = 0L
    val it = bm.values().iterator()
    while (it.hasNext) n += containerCount(it.next())
    n
  }

  /** Canonical bytes: `int32 nContainers` then per container (ascending
    * high part) `int64 high, int32 count`, followed by `count` uint16
    * slots when count ≤ 4096 else 1024 int64 words. */
  def serialize(bm: Bitmap): Array[Byte] = {
    var size = 4L // Long: a sparse 64-bit key set can exceed Int bytes
    val sit = bm.values().iterator()
    val counts = new Array[Int](bm.size())
    var ci = 0
    while (sit.hasNext) {
      val n = containerCount(sit.next())
      counts(ci) = n; ci += 1
      size += 8 + 4 + (if (n <= ArrayMax) 2L * n else 8L * BitmapWords)
    }
    require(size <= Int.MaxValue - 8,
      s"bitmap serialization is $size bytes — beyond a single binary " +
        "cell; split the aggregation (e.g. group by a key prefix and " +
        "roll partials up with bitmap_merge)")
    val bb = ByteBuffer.allocate(size.toInt)
    bb.putInt(bm.size())
    val it = bm.entrySet().iterator()
    ci = 0
    while (it.hasNext) {
      val e = it.next()
      val n = counts(ci); ci += 1
      bb.putLong(e.getKey)
      bb.putInt(n)
      e.getValue match {
        case arr: Array[Char] if n <= ArrayMax =>
          var i = 0
          while (i < arr.length) { bb.putChar(arr(i)); i += 1 }
        case words: Array[Long] if n <= ArrayMax =>
          // Sparse bit set canonicalizes back to a sorted slot array.
          var w = 0
          while (w < BitmapWords) {
            var bits = words(w)
            while (bits != 0L) {
              val t = java.lang.Long.numberOfTrailingZeros(bits)
              bb.putChar(((w << 6) | t).toChar)
              bits &= bits - 1
            }
            w += 1
          }
        case arr: Array[Char] =>
          // n > ArrayMax can only arise from a bit-set container, but stay
          // total: densify.
          val words = new Array[Long](BitmapWords)
          var i = 0
          while (i < arr.length) { val s = arr(i); words(s >>> 6) |= (1L << (s & 63)); i += 1 }
          var w = 0
          while (w < BitmapWords) { bb.putLong(words(w)); w += 1 }
        case words: Array[Long] =>
          var w = 0
          while (w < BitmapWords) { bb.putLong(words(w)); w += 1 }
      }
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Bitmap = {
    val bb = ByteBuffer.wrap(bytes)
    val bm = empty()
    val nc = bb.getInt
    var c = 0
    while (c < nc) {
      val high = bb.getLong
      val n = bb.getInt
      if (n <= ArrayMax) {
        val arr = new Array[Char](n)
        var i = 0
        while (i < n) { arr(i) = bb.getChar; i += 1 }
        bm.put(high, arr)
      } else {
        val words = new Array[Long](BitmapWords)
        var w = 0
        while (w < BitmapWords) { words(w) = bb.getLong; w += 1 }
        bm.put(high, words)
      }
      c += 1
    }
    bm
  }

  /** Cardinality straight off the wire format — header `count` fields
    * only, payloads skipped. Called from generated code. */
  def cardinalityBytes(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes)
    val nc = bb.getInt
    var n = 0L
    var c = 0
    while (c < nc) {
      bb.getLong // high
      val cnt = bb.getInt
      n += cnt
      bb.position(bb.position() +
        (if (cnt <= ArrayMax) 2 * cnt else 8 * BitmapWords))
      c += 1
    }
    n
  }

  /** Membership test off the wire format (binary search over containers
    * then slots). Called from generated code. */
  def containsBytes(bytes: Array[Byte], v: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes)
    val high = v >>> 16
    val slot = (v & 0xffffL).toChar
    val nc = bb.getInt
    var c = 0
    while (c < nc) {
      val h = bb.getLong
      val cnt = bb.getInt
      val payload = if (cnt <= ArrayMax) 2 * cnt else 8 * BitmapWords
      if (h == high) {
        if (cnt <= ArrayMax) {
          var lo = 0; var hi = cnt - 1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val s = bb.getChar(bb.position() + 2 * mid)
            if (s == slot) return true
            else if (s < slot) lo = mid + 1
            else hi = mid - 1
          }
          return false
        } else {
          val word = bb.getLong(bb.position() + 8 * (slot >>> 6))
          return (word & (1L << (slot & 63))) != 0L
        }
      }
      bb.position(bb.position() + payload)
      c += 1
    }
    false
  }

  // ---- Column surface ----------------------------------------------------

  /** Aggregate: canonical bitmap bytes over a BIGINT column (NULLs
    * ignored, like COUNT(DISTINCT)). */
  def bitmapBuild(c: Column): Column =
    Bridge.column(BitmapBuildAgg(Bridge.expression(c))
      .toAggregateExpression())

  /** Aggregate: union of already-built bitmap binaries — the rollup /
    * re-aggregation form. */
  def bitmapMerge(c: Column): Column =
    Bridge.column(BitmapMergeAgg(Bridge.expression(c))
      .toAggregateExpression())

  /** Scalar: exact distinct count carried by a bitmap binary. */
  def bitmapCardinality(c: Column): Column =
    Bridge.column(BitmapCardinality(Bridge.expression(c)))

  /** Scalar: membership of a BIGINT key in a bitmap binary. */
  def bitmapContains(bytes: Column, v: Column): Column =
    Bridge.column(BitmapContains(
      Bridge.expression(bytes), Bridge.expression(v)))

  /** Scalar: canonical union of two bitmap binaries (row-wise OR — the
    * maintained-view merge of a stored bitmap with a churn bitmap). */
  def bitmapUnion(a: Column, b: Column): Column =
    Bridge.column(BitmapUnion(Bridge.expression(a), Bridge.expression(b)))

  /** Called from generated code: union two wire-format bitmaps. */
  def unionBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    serialize(merge(deserialize(a), deserialize(b)))

  /** Scalar: canonical intersection of two bitmap binaries. */
  def bitmapAnd(a: Column, b: Column): Column =
    Bridge.column(BitmapAnd(Bridge.expression(a), Bridge.expression(b)))

  /** Scalar: canonical difference (a \ b) of two bitmap binaries. */
  def bitmapAndNot(a: Column, b: Column): Column =
    Bridge.column(BitmapAndNot(Bridge.expression(a), Bridge.expression(b)))

  /** Called from generated code: intersect two wire-format bitmaps. */
  def andBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    serialize(intersect(deserialize(a), deserialize(b)))

  /** Called from generated code: a \ b over wire-format bitmaps. */
  def andNotBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    serialize(andNot(deserialize(a), deserialize(b)))
}

/** `bitmap_build(x)`: aggregate a BIGINT column into canonical bitmap
  * bytes. Distributive (buffer union), so map-side partials apply. */
case class BitmapBuildAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap64.Bitmap] {

  override def createAggregationBuffer(): Bitmap64.Bitmap = Bitmap64.empty()

  override def update(buf: Bitmap64.Bitmap, input: InternalRow): Bitmap64.Bitmap = {
    val v = child.eval(input)
    if (v != null) Bitmap64.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Bitmap64.Bitmap, b2: Bitmap64.Bitmap): Bitmap64.Bitmap =
    Bitmap64.merge(b1, b2)

  override def eval(buf: Bitmap64.Bitmap): Any = Bitmap64.serialize(buf)

  override def serialize(buf: Bitmap64.Bitmap): Array[Byte] =
    Bitmap64.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap64.Bitmap =
    Bitmap64.deserialize(bytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bitmap_build expects BIGINT, got ${dt.sql}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bitmap_build"

  override def withNewMutableAggBufferOffset(o: Int): BitmapBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapBuildAgg =
    copy(child = newChildren.head)
}

/** `bitmap_merge(b)`: union pre-built bitmap binaries — rollup over stored
  * partials without touching raw keys. */
case class BitmapMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap64.Bitmap] {

  override def createAggregationBuffer(): Bitmap64.Bitmap = Bitmap64.empty()

  override def update(buf: Bitmap64.Bitmap, input: InternalRow): Bitmap64.Bitmap = {
    val v = child.eval(input)
    if (v != null)
      Bitmap64.merge(buf, Bitmap64.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: Bitmap64.Bitmap, b2: Bitmap64.Bitmap): Bitmap64.Bitmap =
    Bitmap64.merge(b1, b2)

  override def eval(buf: Bitmap64.Bitmap): Any = Bitmap64.serialize(buf)

  override def serialize(buf: Bitmap64.Bitmap): Array[Byte] =
    Bitmap64.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap64.Bitmap =
    Bitmap64.deserialize(bytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bitmap_merge expects BINARY bitmap bytes, got ${dt.sql}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bitmap_merge"

  override def withNewMutableAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapMergeAgg =
    copy(child = newChildren.head)
}

/** `bitmap_union(a, b)`: canonical union of two bitmap binaries. */
case class BitmapUnion(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_union"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (BINARY, BINARY), got ${l.sql} / ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bitmap64.unionBytes(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Bitmap64.unionBytes($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BitmapUnion =
    copy(left = newLeft, right = newRight)
}

/** `bitmap_and(a, b)`: canonical intersection of two bitmap binaries. */
case class BitmapAnd(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_and"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (BINARY, BINARY), got ${l.sql} / ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bitmap64.andBytes(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Bitmap64.andBytes($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BitmapAnd =
    copy(left = newLeft, right = newRight)
}

/** `bitmap_andnot(a, b)`: canonical difference a \ b of bitmap binaries. */
case class BitmapAndNot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_andnot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (BINARY, BINARY), got ${l.sql} / ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bitmap64.andNotBytes(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Bitmap64.andNotBytes($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BitmapAndNot =
    copy(left = newLeft, right = newRight)
}

/** `bitmap_cardinality(b)`: exact distinct count from canonical bitmap
  * bytes — reads only container headers, payloads skipped. */
case class BitmapCardinality(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_cardinality"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY bitmap bytes, got ${dt.sql}")
  }

  override protected def nullSafeEval(b: Any): Any =
    Bitmap64.cardinalityBytes(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.Bitmap64.cardinalityBytes($b)")

  override protected def withNewChildInternal(
      newChild: Expression): BitmapCardinality = copy(child = newChild)
}

/** `bitmap_contains(b, v)`: membership of a BIGINT key in canonical bitmap
  * bytes — container binary search straight off the wire format. */
case class BitmapContains(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bitmap_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (BINARY, BIGINT), got ${l.sql} / ${r.sql}")
    }

  override protected def nullSafeEval(b: Any, v: Any): Any =
    Bitmap64.containsBytes(b.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, v) => s"graft.functions.Bitmap64.containsBytes($b, $v)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BitmapContains =
    copy(left = newLeft, right = newRight)
}
