package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Specs for standalone relational operators (as-of join). */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: latest right row at-or-before each left ts, per key") {
    val left = Seq(
      (1L, 10L, 100L), // key 1: matches right ts=100 (inclusive)
      (2L, 10L, 150L), // key 1: matches right ts=120 (latest ≤ 150)
      (3L, 20L, 90L),  // key 2: no right row ≤ 90 → null
      (4L, 30L, 500L)  // key 3: no right rows at all → null
    ).toDF("event_id", "key", "ts")
    val right = Seq(
      (10L, 100L, "a"),
      (10L, 120L, "b"),
      (10L, 200L, "c"), // after every left ts for key 1 → never chosen
      (20L, 95L, "d")   // after left ts 90 → not chosen
    ).toDF("key", "ts", "tag")

    val out = AsOfJoin.asOf(left, col("key"), col("ts"),
        right, col("key"), col("ts"),
        Seq("tag" -> col("tag"), "right_ts" -> col("ts")))
      .orderBy("event_id")
      .select("event_id", "tag", "right_ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))

    assert(out.toSeq == Seq(
      (1L, Some("a"), Some(100L)),
      (2L, Some("b"), Some(120L)),
      (3L, None, None),
      (4L, None, None)))
  }

  test("range join counts matches in [ts-window, ts), zeros kept") {
    import graft.operators.RangeJoin
    val left = Seq(
      (1L, 10L, 100L), // right @95 in [90,100); @100 NOT (exclusive)
      (2L, 10L, 96L),  // right @95 only ([86,96))
      (3L, 20L, 50L)   // no right rows for key 20
    ).toDF("event_id", "key", "ts")
    val right = Seq((10L, 95L), (10L, 100L), (10L, 89L), (30L, 95L))
      .toDF("key", "ts")
    val out = RangeJoin.countPreceding(left, col("event_id"), col("key"),
        col("ts"), right, col("key"), col("ts"), window = 10L)
      .orderBy("id").select("id", "n_matches")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 2L), (3L, 0L)))
  }

  test("GraftTable facade: snapshot/asOf/incremental/deleteView agree with readers") {
    val dir = Fixtures.cowDir(spark, sf0001)
    val t = graft.sources.GraftTable(spark, dir)
    assert(t.commits == Seq(Fixtures.C1, Fixtures.C2, Fixtures.C3, Fixtures.C4))
    assert(t.snapshot().count() ==
      graft.read.SnapshotReader.read(spark, dir).count())
    assert(t.asOf(Fixtures.C2).count() ==
      graft.read.SnapshotReader.read(spark, dir, Some(Fixtures.C2)).count())
    assert(t.deleteView(Fixtures.C2).count() > 0)
    t.register("graft_orders")
    assert(spark.sql("SELECT count(*) FROM graft_orders").head().getLong(0) ==
      t.snapshot().count())
  }

  test("as-of join: left columns pass through unchanged") {
    val left = Seq((1L, 5L, 50L, "x")).toDF("event_id", "key", "ts", "extra")
    val right = Seq((5L, 40L, 7L)).toDF("key", "ts", "payload")
    val out = AsOfJoin.asOf(left, col("key"), col("ts"),
      right, col("key"), col("ts"), Seq("payload" -> col("payload")))
    assert(out.columns.toSeq ==
      Seq("event_id", "key", "ts", "extra", "payload"))
    assert(out.select("extra", "payload").as[(String, Long)].head() ==
      ("x", 7L))
  }

  test("exactQuantiles matches a sorted-take reference on integers, " +
      "duplicates, tiny inputs, and p in {0, 1}") {
    import graft.operators.Quantiles
    def ref(vals: Seq[Double], p: Double): Double = {
      val s = vals.sorted
      s(math.max(1, math.ceil(p * s.size).toInt) - 1)
    }
    val cases = Seq(
      (1 to 100).map(_.toDouble),                    // uniform
      Seq(1.0, 1.0, 1.0, 100.0),                     // tie-dominated
      Seq(42.0),                                     // single row
      (1 to 7).map(_ => 3.14),                       // all equal
      Seq(-5.0, -1.0, 0.0, 2.5, 2.5, 9.0))           // negatives + dup
    val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    for (vals <- cases) {
      val df = vals.toDF("x")
      // tiny buckets/maxExact force several refinement + widen rounds
      val got = Quantiles.exactQuantiles(df, $"x", probs,
          buckets = 4, maxExact = 2)
        .orderBy($"p_permille").collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      for (p <- probs)
        assert(got(math.round(p * 1000).toInt) == ref(vals, p),
          s"vals=$vals p=$p got=${got(math.round(p * 1000).toInt)} " +
            s"want=${ref(vals, p)}")
    }
    // empty input -> empty result, null rows ignored
    assert(Quantiles.exactQuantiles(
      Seq.empty[Double].toDF("x"), $"x", Seq(0.5)).isEmpty)
    val withNulls = Seq(Some(1.0), None, Some(3.0), None).toDF("x")
    assert(Quantiles.exactQuantiles(withNulls, $"x", Seq(1.0))
      .collect()(0).getDouble(1) == 3.0)
  }

  test("exactQuantilesBy == per-group sorted-take reference; mixed " +
      "group sizes refine together") {
    import graft.operators.Quantiles
    def ref(vals: Seq[Long], p: Double): Long = {
      val s = vals.sorted
      s(math.max(1, math.ceil(p * s.size).toInt) - 1)
    }
    // group "big": 1..1000; group "tiny": three rows; group "ties":
    // all-equal — one call advances all of them
    val rows =
      (1L to 1000L).map(v => ("big", v)) ++
        Seq(("tiny", 7L), ("tiny", 3L), ("tiny", 11L)) ++
        (1 to 5).map(_ => ("ties", 42L))
    val df = rows.toDF("g", "v")
    val probs = Seq(0.0, 0.5, 0.9, 1.0)
    val got = Quantiles.exactQuantilesBy(df, $"g", $"v", probs,
        buckets = 4, maxExact = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val byG = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2) }
    for ((g, vs) <- byG; p <- probs)
      assert(got((g, math.round(p * 1000).toInt)) == ref(vs, p),
        s"g=$g p=$p")
    assert(got.size == byG.size * probs.size)
  }

  test("exactQuantiles on longs keeps the column type exact") {
    import graft.operators.Quantiles
    val df = (1L to 1000L).toDF("x")
    val out = Quantiles.exactQuantiles(df, $"x", Seq(0.5, 0.999),
      buckets = 8, maxExact = 10)
    assert(out.schema("value").dataType ==
      org.apache.spark.sql.types.LongType)
    val m = out.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m(500) == 500L && m(999) == 999L)
  }

  // fp total order used by the reference models: -Inf < finite < +Inf < NaN
  private def fpSorted(vals: Seq[Double]): Seq[Double] =
    vals.sortWith((a, b) => java.lang.Double.compare(a, b) < 0)

  test("exactQuantiles: ±Inf / NaN bands answered exactly, finite ranks " +
      "refined on the finite sub-column only") {
    import graft.operators.Quantiles
    val vals = Seq(Double.NegativeInfinity, Double.NegativeInfinity) ++
      (1 to 40).map(_.toDouble) ++
      Seq(Double.PositiveInfinity, Double.NaN, Double.NaN)
    def ref(p: Double): Double = {
      val s = fpSorted(vals)
      s(math.max(1, math.ceil(p * s.size).toInt) - 1)
    }
    val probs = Seq(0.0, 0.02, 0.05, 0.5, 0.93, 0.96, 1.0)
    val got = Quantiles.exactQuantiles(vals.toDF("x"), $"x", probs,
        buckets = 4, maxExact = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (p <- probs) {
      val (g, w) = (got(math.round(p * 1000).toInt), ref(p))
      assert(g == w || (g.isNaN && w.isNaN), s"p=$p got=$g want=$w")
    }
  }

  test("exactQuantiles: finite range wider than Double.MaxValue (width " +
      "overflow) still refines exactly via halved bucketing") {
    import graft.operators.Quantiles
    val vals = Seq(-Double.MaxValue, -1.5e308, -7.0, -1.0, 0.0, 2.0,
      5.0, 9.0, 1.2e308, Double.MaxValue, Double.MaxValue)
    def ref(p: Double): Double = {
      val s = fpSorted(vals)
      s(math.max(1, math.ceil(p * s.size).toInt) - 1)
    }
    val probs = Seq(0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0)
    val got = Quantiles.exactQuantiles(vals.toDF("x"), $"x", probs,
        buckets = 4, maxExact = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (p <- probs)
      assert(got(math.round(p * 1000).toInt) == ref(p), s"p=$p")
  }

  test("exactQuantilesBy: 10^4 groups advance together with O(1) rows " +
      "collected per (group, prob) per round; non-finite groups routed") {
    import graft.operators.Quantiles
    // 10^4 groups x 6 rows, tiny maxExact so every group refines; a few
    // groups carry ±Inf/NaN rows; one group is entirely NaN.
    val rows = (0 until 10000).flatMap { g =>
      val extra: Seq[Double] =
        if (g % 997 == 0) Seq(Double.NegativeInfinity, Double.NaN)
        else if (g % 499 == 0) Seq(Double.PositiveInfinity)
        else Seq.empty
      ((1 to 6).map(i => (g.toDouble * 7 + i * i).toDouble) ++ extra)
        .map(v => (g.toLong, v))
    } ++ Seq((10000L, Double.NaN), (10000L, Double.NaN))
    val df = rows.toDF("g", "v").repartition(8)
    val probs = Seq(0.1, 0.5, 1.0)
    val got = Quantiles.exactQuantilesBy(df, $"g", $"v", probs,
        buckets = 4, maxExact = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val byG = rows.groupBy(_._1)
    assert(got.size == byG.size * probs.size)
    for ((g, vs0) <- byG; p <- probs) {
      val s = fpSorted(vs0.map(_._2))
      val w = s(math.max(1, math.ceil(p * s.size).toInt) - 1)
      val a = got((g, math.round(p * 1000).toInt))
      assert(a == w || (a.isNaN && w.isNaN), s"g=$g p=$p got=$a want=$w")
    }
  }

  test("exactQuantiles rejects probabilities colliding on the same " +
      "permille output key") {
    import graft.operators.Quantiles
    val df = Seq(1.0, 2.0).toDF("x")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, $"x", Seq(0.5001, 0.5004))
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantilesBy(df, lit("a"), $"x", Seq(0.5001, 0.5004))
    }
  }
}
