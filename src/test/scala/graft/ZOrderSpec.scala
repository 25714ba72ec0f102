package graft

import graft.format.{MetaCols, Timeline}
import graft.functions.ZValue
import graft.read.{ChangeFeed, SnapshotReader}
import graft.write.{CowWriter, TableMaintenance}
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** Z-order layout rewrite: Morton-interleaved multi-column locality as a
  * layout-only CLUSTER commit, and the native [[ZValue]] kernel pinned
  * against a reference implementation (interpreted ≡ codegen). */
class ZOrderSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  /** Reference z-value: the spec's independent reimplementation of
    * bucket-by-binary-search + MSB-first bit interleave. */
  private def refZ(vals: Seq[Option[Double]],
      bounds: Seq[Array[Double]]): Long = {
    val bits = math.max(1, bounds.map(b =>
      32 - Integer.numberOfLeadingZeros(math.max(b.length, 1))).max)
    val bks = vals.zip(bounds).map {
      case (None, _) => 0
      case (Some(v), bs) =>
        val idx = java.util.Arrays.binarySearch(bs, v)
        if (idx >= 0) idx + 1 else -idx - 1
    }
    var z = 0L
    for (bit <- (bits - 1) to 0 by -1; b <- bks)
      z = (z << 1) | ((b >>> bit) & 1L)
    z
  }

  test("ZValue: codegen and interpreted match the reference, incl. nulls") {
    val bounds = Seq(Array(10.0, 20.0, 30.0), Array(0.5))
    val rows = Seq(
      (Some(5.0), Some(0.1)), (Some(10.0), Some(0.5)),
      (Some(15.0), Some(0.9)), (Some(25.0), None),
      (None, Some(1.0)), (None, None), (Some(35.0), Some(0.4)),
      (Some(30.0), Some(0.5)))
    val df = rows.toDF("a", "b")
    val zc = ZValue.zvalue(Seq(col("a"), col("b")), bounds)
    val expected = rows.map { case (a, b) => refZ(Seq(a, b), bounds) }
    // codegen path (default projection)
    assert(df.select(zc).as[Long].collect().toSeq == expected)
    // interpreted path (direct expression eval over literal inputs)
    import org.apache.spark.sql.catalyst.InternalRow
    val litZ = rows.map { case (a, b) =>
      ZValue(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(a.orNull,
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Literal(b.orNull,
          org.apache.spark.sql.types.DoubleType)), bounds)
        .eval(InternalRow.empty).asInstanceOf[Long]
    }
    assert(litZ == expected)
  }

  test("ZValue: z-curve locality — prefix bits partition the plane") {
    // 2 cols × 2 bits: 16 cells; the top interleaved bit pair splits the
    // plane into quadrants — every point in the lower-left quadrant must
    // sort before every point in the upper-right quadrant.
    val bounds = Seq(Array(25.0, 50.0, 75.0), Array(25.0, 50.0, 75.0))
    def z(a: Double, b: Double) = refZ(Seq(Some(a), Some(b)), bounds)
    for (xa <- Seq(1.0, 30.0); ya <- Seq(1.0, 30.0);
         xb <- Seq(60.0, 90.0); yb <- Seq(60.0, 90.0))
      assert(z(xa, ya) < z(xb, yb),
        s"low ($xa,$ya) must z-sort before high ($xb,$yb)")
  }

  private def rowsAB(n: Int) = (1 to n).map { i =>
    (i.toLong, s"p${i % 2}", (i * 37) % 1000, ((i * 91) % 1000).toDouble)
  }.toDF("k", "p", "a", "b")

  test("COW: zorder commit preserves rows/identity/fileIds; files z-sorted") {
    val dir = freshDir("zorder_cow")
    val w = new CowWriter(spark, dir, numBuckets = 4)
    w.insert(rowsAB(400), $"k", $"p", Fixtures.C1)
    w.delete(rowsAB(400).filter($"k" % 5 === 0), $"k", $"p", Fixtures.C2)

    val before = SnapshotReader.read(spark, dir)
      .select("k", "a", "b", MetaCols.CommitTime).collect().toSet
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    val fidsBefore = tl.latestSlices(None).keySet

    val rewritten = TableMaintenance.zorderLayout(spark, dir, Fixtures.C3,
      Seq("a", "b"), bits = 4)
    tl.refresh()

    // snapshot identical: rows, payloads, original commit times
    val after = SnapshotReader.read(spark, dir)
      .select("k", "a", "b", MetaCols.CommitTime).collect().toSet
    assert(after == before)
    // fileIds preserved (key routing and bucket pruning untouched)
    assert(tl.latestSlices(None).keySet == fidsBefore)
    assert(rewritten.toSet == fidsBefore)
    // time travel, CDC, incremental all see a layout-only commit
    assert(SnapshotReader.read(spark, dir, Some(Fixtures.C2))
      .select("k", "a", "b", MetaCols.CommitTime).collect().toSet == before)
    assert(ChangeFeed.read(spark, dir, Fixtures.C2, Fixtures.C3).count() == 0)
    assert(graft.read.IncrementalReader
      .read(spark, dir, Fixtures.C2, Fixtures.C3).count() == 0)
    // both z columns joined the file-level stats index
    val stats = tl.fileColStats(tl.latestSlices(None).values.toSeq)
    assert(stats.values.exists(s => s.contains("a") && s.contains("b")))

    // every latest file's rows are sorted by their z-value (boundaries
    // recomputed from the same data — the sketch is deterministic)
    val merged = SnapshotReader.read(spark, dir)
    val bounds = merged
      .select(col("a").cast("double").as("__z0"),
        col("b").cast("double").as("__z1"))
      .stat.approxQuantile(Array("__z0", "__z1"),
        (1 until 16).map(_ / 16.0).toArray, 0.001)
      .map(_.distinct.sorted)
    tl.latestSlices(None).values.flatMap(_.relPath).foreach { rel =>
      val zs = spark.read.parquet(s"$dir/$rel")
        .select(ZValue.zvalue(
          Seq(col("a").cast("double"), col("b").cast("double")),
          bounds.toSeq))
        .as[Long].collect().toSeq
      assert(zs == zs.sorted, s"$rel not z-ordered")
    }
  }

  test("zorder validates its inputs") {
    val dir = freshDir("zorder_bad")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(Seq((1L, "p", "x")).toDF("k", "p", "s"), $"k", $"p",
      Fixtures.C1)
    val e1 = intercept[IllegalArgumentException](
      TableMaintenance.zorderLayout(spark, dir, Fixtures.C2, Seq("k")))
    assert(e1.getMessage.contains("≥ 2 columns"))
    val e2 = intercept[IllegalArgumentException](
      TableMaintenance.zorderLayout(spark, dir, Fixtures.C2,
        Seq("k", "s")))
    assert(e2.getMessage.contains("unsupported type"))
    val e3 = intercept[IllegalArgumentException](
      TableMaintenance.zorderLayout(spark, dir, Fixtures.C2,
        Seq("k", "k"), bits = 40))
    assert(e3.getMessage.contains("63 bits"))
  }
}
