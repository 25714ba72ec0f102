package graft

import graft.functions.Bitmap64
import org.apache.spark.sql.functions._

/** Exact mergeable distinct-count bitmaps: aggregate ≡ COUNT(DISTINCT),
  * rollup over stored partials ≡ direct aggregation, canonical bytes. */
class BitmapSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap_build + cardinality equals COUNT(DISTINCT), grouped") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val got = li.groupBy($"l_returnflag")
      .agg(Bitmap64.bitmapCardinality(
        Bitmap64.bitmapBuild($"l_orderkey")).as("n"))
      .orderBy($"l_returnflag")
      .as[(String, Long)].collect().toSeq
    val want = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .orderBy($"l_returnflag")
      .as[(String, Long)].collect().toSeq
    assert(got == want)
  }

  test("two-level rollup over stored bitmap partials equals direct distinct") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    // Stage 1: per-(flag, status) bitmap partials — what a per-day job
    // would persist. Stage 2: union partials per flag, NO raw-key rescan.
    val partials = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(Bitmap64.bitmapBuild($"l_orderkey").as("bm"))
    val rolled = partials.groupBy($"l_returnflag")
      .agg(Bitmap64.bitmapCardinality(Bitmap64.bitmapMerge($"bm")).as("n"))
      .orderBy($"l_returnflag").as[(String, Long)].collect().toSeq
    val direct = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .orderBy($"l_returnflag").as[(String, Long)].collect().toSeq
    assert(rolled == direct)
  }

  test("canonical bytes: same value set -> same bytes, any build order") {
    val vs = (0L until 9000L).map(_ * 7919L) ++ Seq(-1L, -65536L,
      Long.MaxValue, Long.MinValue, 0L, 65535L, 65536L)
    val a = Bitmap64.empty(); val b = Bitmap64.empty()
    vs.foreach(Bitmap64.add(a, _))
    scala.util.Random.shuffle(vs).foreach(Bitmap64.add(b, _))
    // merge order / duplicate adds must not change the wire form either
    vs.take(100).foreach(Bitmap64.add(b, _))
    assert(java.util.Arrays.equals(Bitmap64.serialize(a), Bitmap64.serialize(b)))
    assert(Bitmap64.cardinality(a) == vs.distinct.size.toLong)
    assert(Bitmap64.cardinalityBytes(Bitmap64.serialize(a)) == vs.distinct.size.toLong)
  }

  test("array->bitset container crossover at 4096 stays exact both sides") {
    // One container (same high part), straddling the crossover: 5000 slots.
    val vs = (0 until 5000).map(i => (1234L << 16) | (i * 13 % 65536).toLong)
      .distinct
    val bm = Bitmap64.empty()
    vs.foreach(Bitmap64.add(bm, _))
    assert(Bitmap64.cardinality(bm) == vs.size.toLong)
    val bytes = Bitmap64.serialize(bm)
    assert(Bitmap64.cardinalityBytes(bytes) == vs.size.toLong)
    val back = Bitmap64.deserialize(bytes)
    assert(java.util.Arrays.equals(Bitmap64.serialize(back), bytes))
    // merge of two halves equals the whole
    val (l, r) = vs.splitAt(vs.size / 2)
    val a = Bitmap64.empty(); val b = Bitmap64.empty()
    l.foreach(Bitmap64.add(a, _)); r.foreach(Bitmap64.add(b, _))
    assert(java.util.Arrays.equals(
      Bitmap64.serialize(Bitmap64.merge(a, b)), bytes))
  }

  test("bitmap_contains: membership off the wire format") {
    val vs = Seq(1L, 2L, 100000L, -5L, Long.MaxValue)
    val bm = Bitmap64.empty()
    vs.foreach(Bitmap64.add(bm, _))
    val bytes = Bitmap64.serialize(bm)
    vs.foreach(v => assert(Bitmap64.containsBytes(bytes, v), s"missing $v"))
    Seq(3L, -6L, 99999L, 0L).foreach(v =>
      assert(!Bitmap64.containsBytes(bytes, v), s"phantom $v"))

    // and through the Column surface, codegen path
    val df = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("g", "v")
    val got = df.groupBy($"g").agg(Bitmap64.bitmapBuild($"v").as("bm"))
      .select($"g", Bitmap64.bitmapContains($"bm", lit(10L)).as("has10"),
        Bitmap64.bitmapContains($"bm", lit(20L)).as("has20"))
      .orderBy($"g").as[(Long, Boolean, Boolean)].collect().toSeq
    assert(got == Seq((1L, true, true), (2L, true, false)))
  }

  test("set algebra: and / andnot / union agree with Scala sets across " +
    "container forms, results canonical") {
    // straddle the array/bitset crossover on a shared high part plus
    // scattered containers, so every container-pair case is exercised
    val a = ((0 until 5000).map(i => (7L << 16) | (i * 3 % 65536).toLong) ++
      (0 until 100).map(i => (9L << 16) | i.toLong) ++ Seq(-1L, 42L)).distinct
    val b = ((0 until 5000).map(i => (7L << 16) | (i * 5 % 65536).toLong) ++
      (0 until 50).map(i => (9L << 16) | (i * 2).toLong) ++ Seq(-1L, 43L))
      .distinct
    val bmA = Bitmap64.empty(); val bmB = Bitmap64.empty()
    a.foreach(Bitmap64.add(bmA, _)); b.foreach(Bitmap64.add(bmB, _))
    val sa = a.toSet; val sb = b.toSet
    def viaSet(s: Set[Long]): Array[Byte] = {
      val bm = Bitmap64.empty(); s.toSeq.sorted.foreach(Bitmap64.add(bm, _))
      Bitmap64.serialize(bm)
    }
    assert(java.util.Arrays.equals(
      Bitmap64.andBytes(Bitmap64.serialize(bmA), Bitmap64.serialize(bmB)),
      viaSet(sa & sb)))
    assert(java.util.Arrays.equals(
      Bitmap64.andNotBytes(Bitmap64.serialize(bmA), Bitmap64.serialize(bmB)),
      viaSet(sa -- sb)))
    assert(java.util.Arrays.equals(
      Bitmap64.unionBytes(Bitmap64.serialize(bmA), Bitmap64.serialize(bmB)),
      viaSet(sa | sb)))
    // empty results stay canonical (zero containers, never empty ones)
    assert(Bitmap64.cardinalityBytes(
      Bitmap64.andBytes(viaSet(Set(1L)), viaSet(Set(2L)))) == 0L)
  }

  test("codegen and interpreted cardinality agree") {
    val df = spark.range(0, 10000, 1, 4)
      .select((col("id") % 977).as("v"))
    val bytesRow = df.agg(Bitmap64.bitmapBuild($"v").as("bm"))
      .select($"bm").as[Array[Byte]].head()
    // interpreted
    assert(Bitmap64.cardinalityBytes(bytesRow) == 977L)
    // codegen'd projection over a non-literal binary column
    val n = df.agg(Bitmap64.bitmapBuild($"v").as("bm"))
      .select(Bitmap64.bitmapCardinality($"bm").as("n"))
      .as[Long].head()
    assert(n == 977L)
  }
}
