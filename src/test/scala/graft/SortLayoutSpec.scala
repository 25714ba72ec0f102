package graft

import graft.format.{MetaCols, Timeline}
import graft.read.{ChangeFeed, SnapshotReader}
import graft.write.{CowWriter, MorWriter, TableMaintenance}
import org.apache.spark.sql.functions._

/** Sort-layout rewrite: layout-only CLUSTER commits — within-file ordering
  * for row-group pruning, with row identity, commit times, fileIds, and
  * every read surface preserved. */
class SortLayoutSpec extends SparkSpec {
  import spark.implicits._

  // values deliberately anti-sorted vs keys so the rewrite must reorder
  private def rows(nKeys: Int) = (1 to nKeys)
    .map(i => (i.toLong, s"p${i % 2}", (nKeys - i) * 3)).toDF("k", "p", "v")

  private def fileRowsSorted(dir: String, ts: String,
      colName: String): Boolean = {
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    tl.latestSlices(None).values.flatMap(_.relPath).forall { rel =>
      assert(rel.contains(s"_$ts"), s"slice $rel not from the cluster commit")
      val vs = spark.read.parquet(s"$dir/$rel")
        .select(colName).as[Int].collect().toSeq
      vs == vs.sorted
    }
  }

  test("COW: cluster commit sorts files, preserves rows/identity/fileIds") {
    val dir = freshDir("sort_cow")
    val w = new CowWriter(spark, dir, numBuckets = 4)
    w.insert(rows(300), $"k", $"p", Fixtures.C1)
    w.upsert(rows(300).filter($"k" % 10 === 0)
      .withColumn("v", $"v" + 1), $"k", $"p", Fixtures.C2)

    val before = SnapshotReader.read(spark, dir)
      .select("k", "v", MetaCols.CommitTime).collect().toSet
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    val fidsBefore = tl.latestSlices(None).keySet

    val rewritten = TableMaintenance.sortLayout(spark, dir, Fixtures.C3,
      Seq("v"))
    tl.refresh()

    // snapshot is IDENTICAL — rows, payloads, and original commit times
    val after = SnapshotReader.read(spark, dir)
      .select("k", "v", MetaCols.CommitTime).collect().toSet
    assert(after == before)
    // fileIds preserved (key routing and bucket pruning untouched)
    assert(tl.latestSlices(None).keySet == fidsBefore)
    assert(rewritten.toSet == fidsBefore)
    // every latest file is from the cluster commit and sorted by v
    assert(fileRowsSorted(dir, Fixtures.C3, "v"))
    // time travel to the pre-cluster state still serves it
    assert(SnapshotReader.read(spark, dir, Some(Fixtures.C2))
      .select("k", "v", MetaCols.CommitTime).collect().toSet == before)
    // the change feed emits NOTHING for the layout commit
    assert(ChangeFeed.read(spark, dir, Fixtures.C2, Fixtures.C3).count() == 0)
    // incremental across it selects no rows either
    assert(graft.read.IncrementalReader
      .read(spark, dir, Fixtures.C2, Fixtures.C3).count() == 0)
    // the sort column joined the file-level stats index
    val anyStats = tl.fileColStats(tl.latestSlices(None).values.toSeq)
    assert(anyStats.values.exists(_.contains("v")))
    // bucket-pruned key lookup still finds its row post-cluster
    val hit = SnapshotReader.read(spark, dir)
      .filter(col(MetaCols.RecordKey) === "137")
    assert(hit.count() == 1)
  }

  test("MOR: cluster folds outstanding deltas and sorts") {
    val dir = freshDir("sort_mor")
    val w = new MorWriter(spark, dir, numBuckets = 2)
    w.insert(rows(100), $"k", $"p", Fixtures.C1)
    w.upsertDelta(Some(rows(100).filter($"k" % 7 === 0)
        .withColumn("v", $"v" + 1000)),
      Some(rows(100).filter($"k" === 50)), $"k", $"p", Fixtures.C2)

    val before = SnapshotReader.read(spark, dir)
      .select("k", "v").as[(Long, Int)].collect().toSet
    TableMaintenance.sortLayout(spark, dir, Fixtures.C3, Seq("v"))
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    tl.refresh()
    // deltas folded: pure base slices, snapshot unchanged, files sorted
    assert(tl.latestSlices(None).values.forall(_.deltas.isEmpty))
    assert(SnapshotReader.read(spark, dir)
      .select("k", "v").as[(Long, Int)].collect().toSet == before)
    assert(before.exists(_._2 > 1000) && !before.exists(_._1 == 50L))
    assert(fileRowsSorted(dir, Fixtures.C3, "v"))
  }

  test("unrecorded bucket count refuses (routing could not be preserved)") {
    val dir = freshDir("sort_legacy")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(rows(20), $"k", $"p", Fixtures.C1)
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    val meta = tl.metadata(Fixtures.C1)
    tl.deleteCommit(Fixtures.C1)
    tl.saveCommit(Fixtures.C1, meta.copy(extra = meta.extra - "buckets"))
    tl.refresh()
    val err = intercept[IllegalArgumentException](
      TableMaintenance.sortLayout(spark, dir, Fixtures.C2, Seq("v")))
    assert(err.getMessage.contains("no bucket count"))
  }
}
