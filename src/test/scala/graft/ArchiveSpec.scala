package graft

import graft.format.{MetaCols, Timeline}
import graft.read.{ChangeFeed, IncrementalReader, SnapshotReader}
import graft.write.{CowWriter, MorWriter, TableMaintenance}
import org.apache.spark.sql.functions._

/** Timeline archival: all but the newest `keepActive` instants relocate
  * into immutable archive manifests; every read surface is unchanged and
  * the active `.hoodie` directory stays bounded. */
class ArchiveSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) =
    (1 to n).map(i => (i.toLong, s"p${i % 2}", i * 10)).toDF("k", "p", "v")

  private def activeInstantFiles(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/.hoodie")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".commit") || n.endsWith(".deltacommit"))
  }

  test("COW: every read surface is identical through archival") {
    val dir = freshDir("arch_cow")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(rows(100), $"k", $"p", Fixtures.C1)
    w.delete(rows(100).filter($"k" % 7 === 0), $"k", $"p", Fixtures.C2)
    w.upsert(rows(100).filter($"k" % 10 === 3).withColumn("v", $"v" + 1),
      $"k", $"p", Fixtures.C3)
    w.delete(rows(100).filter($"k" % 11 === 5), $"k", $"p", Fixtures.C4)

    def reads() = (
      SnapshotReader.read(spark, dir).select("k", "v", MetaCols.CommitTime)
        .collect().toSet,
      SnapshotReader.read(spark, dir, Some(Fixtures.C2))
        .select("k", "v").collect().toSet,
      IncrementalReader.read(spark, dir, Fixtures.C1, Fixtures.C3)
        .select("k", "v").collect().toSet,
      ChangeFeed.read(spark, dir, "0", Fixtures.C4)
        .select(col("k"), col(ChangeFeed.ChangeType),
          col(ChangeFeed.ChangeCommitTs)).collect().toSet,
      graft.deleteview.DeleteView(spark, dir, Fixtures.C2).toDF()
        .select("k").collect().toSet)

    val before = reads()
    val archived = TableMaintenance.archiveTimeline(spark, dir,
      keepActive = 1)
    assert(archived == Seq(Fixtures.C1, Fixtures.C2, Fixtures.C3))
    assert(activeInstantFiles(dir) == Seq(s"${Fixtures.C4}.commit"))
    assert(reads() == before)

    // a second pass is a no-op (nothing beyond keepActive is active)
    assert(TableMaintenance.archiveTimeline(spark, dir, 1).isEmpty)
    // the full history is still enumerated
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    assert(tl.completedInstants().map(_.ts) ==
      Seq(Fixtures.C1, Fixtures.C2, Fixtures.C3, Fixtures.C4))
  }

  test("format append resolves table properties from ARCHIVED creation") {
    val dir = freshDir("arch_props")
    rows(50).write.format("graft")
      .option("key", "k").option("partition", "p")
      .option("buckets", "2").option("ts", Fixtures.C1).save(dir)
    rows(50).filter($"k" % 5 === 0).withColumn("v", $"v" + 1)
      .write.format("graft").mode("append")
      .option("ts", Fixtures.C2).save(dir)
    // archive the CREATION commit (carries buckets/key/partition/type)
    assert(TableMaintenance.archiveTimeline(spark, dir, 1) ==
      Seq(Fixtures.C1))
    // an option-less append must still resolve identity + buckets + type
    rows(50).filter($"k" % 9 === 0).withColumn("v", $"v" + 7)
      .write.format("graft").mode("append")
      .option("ts", Fixtures.C3).save(dir)
    val got = spark.read.format("graft").load(dir)
      .select("k", "v").as[(Long, Int)].collect().toMap
    assert(got(40L) == 401 && got(9L) == 97 && got(45L) == 457 &&
      got(1L) == 10)
  }

  test("MOR: slices spanning archived base+delta commits still merge") {
    val dir = freshDir("arch_mor")
    val w = new MorWriter(spark, dir, numBuckets = 2)
    w.insert(rows(60), $"k", $"p", Fixtures.C1)
    w.upsertDelta(Some(rows(60).filter($"k" % 4 === 0)
        .withColumn("v", $"v" + 1000)),
      Some(rows(60).filter($"k" === 30)), $"k", $"p", Fixtures.C2)
    w.upsertDelta(Some(rows(60).filter($"k" === 1)
        .withColumn("v", lit(77))), None, $"k", $"p", Fixtures.C3)
    val before = SnapshotReader.read(spark, dir)
      .select("k", "v").as[(Long, Int)].collect().toSet
    // archive base + first delta; the live slice now spans archive/active
    assert(TableMaintenance.archiveTimeline(spark, dir, 1) ==
      Seq(Fixtures.C1, Fixtures.C2))
    assert(SnapshotReader.read(spark, dir)
      .select("k", "v").as[(Long, Int)].collect().toSet == before)
    assert(before.contains((1L, 77)) && before.contains((4L, 1040)) &&
      !before.exists(_._1 == 30L))
  }

  test("rollback into the archived range refuses; active tail rolls back") {
    val dir = freshDir("arch_rb")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(rows(20), $"k", $"p", Fixtures.C1)
    w.upsert(rows(20).filter($"k" === 1).withColumn("v", lit(1)),
      $"k", $"p", Fixtures.C2)
    w.upsert(rows(20).filter($"k" === 2).withColumn("v", lit(2)),
      $"k", $"p", Fixtures.C3)
    TableMaintenance.archiveTimeline(spark, dir, 2) // archives C1
    // rolling back to C2 (deletes only active C3) works
    assert(TableMaintenance.rollback(spark, dir, Fixtures.C2) ==
      Seq(Fixtures.C3))
    // rolling back INTO the archive (would delete archived C2... C1 is
    // archived; toTs=0 dooms C1+C2, C2 active, C1 archived) refuses
    val err = intercept[IllegalArgumentException](
      TableMaintenance.rollback(spark, dir, "0"))
    assert(err.getMessage.contains("ARCHIVED"))
    // the refused rollback deleted NOTHING (pre-validated): C2 still serves
    assert(SnapshotReader.read(spark, dir)
      .filter($"k" === 1).select("v").as[Int].collect().toSeq == Seq(1))
    intercept[IllegalArgumentException](
      TableMaintenance.archiveTimeline(spark, dir, 0))
  }
}
