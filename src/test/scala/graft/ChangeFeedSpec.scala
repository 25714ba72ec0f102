package graft

import graft.read.ChangeFeed
import graft.write.{CowWriter, MorWriter}
import org.apache.spark.sql.functions._

/** Change-data feed: per-commit insert/update/delete tagging with pre/post
  * images, compaction silence, within-commit delete-wins, overwrite
  * semantics, empty ranges. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ps: (Long, String, Int)*) = ps.toDF("k", "p", "v")

  private def feed(dir: String, from: String, to: String) =
    ChangeFeed.read(spark, dir, from, to)
      .select($"k", $"v", col(ChangeFeed.ChangeType),
        col(ChangeFeed.ChangeCommitTs))
      .as[(Long, Int, String, String)].collect().toSet

  test("COW: insert, update, delete, and re-insert tag correctly") {
    val dir = freshDir("cdc_cow")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(rows((1, "a", 10), (2, "a", 20), (3, "b", 30)),
      $"k", $"p", Fixtures.C1)
    w.upsert(rows((2, "a", 21), (4, "b", 40)), $"k", $"p", Fixtures.C2)
    w.delete(rows((1, "a", 0)), $"k", $"p", Fixtures.C3)
    w.upsert(rows((1, "a", 11)), $"k", $"p", Fixtures.C4) // re-insert

    assert(feed(dir, "0", Fixtures.C4) == Set(
      (1L, 10, "insert", Fixtures.C1), (2L, 20, "insert", Fixtures.C1),
      (3L, 30, "insert", Fixtures.C1),
      (2L, 21, "update", Fixtures.C2), (4L, 40, "insert", Fixtures.C2),
      (1L, 10, "delete", Fixtures.C3),
      (1L, 11, "insert", Fixtures.C4))) // deleted key returns as INSERT

    // sub-range: only the commits inside it
    assert(feed(dir, Fixtures.C2, Fixtures.C3) ==
      Set((1L, 10, "delete", Fixtures.C3)))

    // empty range: zero rows, CDC columns present
    val empty = ChangeFeed.read(spark, dir, Fixtures.C4, Fixtures.C4)
    assert(empty.count() == 0)
    assert(empty.columns.contains(ChangeFeed.ChangeType) &&
      empty.columns.contains(ChangeFeed.ChangeCommitTs))
  }

  test("MOR: delta tagging, within-commit delete-wins, compaction silence") {
    val dir = freshDir("cdc_mor")
    val w = new MorWriter(spark, dir, numBuckets = 2)
    w.insert(rows((1, "a", 10), (2, "a", 20)), $"k", $"p", Fixtures.C1)
    // one delta commit UPSERTS key 1 AND DELETES it: delete must win —
    // the key surfaces ONLY as a delete, never as an update
    w.upsertDelta(Some(rows((1, "a", 11), (3, "a", 30))),
      Some(rows((1, "a", 0))), $"k", $"p", Fixtures.C2)
    w.compact(Fixtures.C3)
    w.upsertDelta(Some(rows((2, "a", 22))), None, $"k", $"p", Fixtures.C4)

    val f = feed(dir, "0", Fixtures.C4)
    assert(f == Set(
      (1L, 10, "insert", Fixtures.C1), (2L, 20, "insert", Fixtures.C1),
      (1L, 10, "delete", Fixtures.C2), // pre-image of the deleted row
      (3L, 30, "insert", Fixtures.C2),
      (2L, 22, "update", Fixtures.C4)), s"got $f")
    // the compaction commit C3 emitted nothing
    assert(!f.exists(_._4 == Fixtures.C3))
  }

  test("overwrite emits written rows tagged against the pre-overwrite state") {
    val dir = freshDir("cdc_ow")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(rows((1, "a", 10), (2, "a", 20)), $"k", $"p", Fixtures.C1)
    w.overwriteTable(rows((2, "a", 25), (9, "a", 90)), $"k", $"p",
      Fixtures.C2)
    val f = feed(dir, Fixtures.C1, Fixtures.C2)
    // key 2 existed → update; key 9 is new → insert; dropped key 1 is NOT
    // enumerated (overwrite replaces the table — its delete view is empty
    // by design, documented)
    assert(f == Set((2L, 25, "update", Fixtures.C2),
      (9L, 90, "insert", Fixtures.C2)), s"got $f")
  }

  test("streaming CDC: each micro-batch is its commit range's change feed, exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("cdc_stream")
    val ckpt = freshDir("cdc_stream_ckpt")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(rows((1, "a", 10), (2, "a", 20)), $"k", $"p", Fixtures.C1)
    w.upsert(rows((2, "a", 21), (3, "a", 30)), $"k", $"p", Fixtures.C2)
    w.delete(rows((1, "a", 0)), $"k", $"p", Fixtures.C3)

    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, String, String)]
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("cdc", "true").option("maxCommitsPerBatch", "1").load(dir)
        .select($"k", $"v", col(ChangeFeed.ChangeType),
          col(ChangeFeed.ChangeCommitTs))
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val rs = batch.collect().map(r => (r.getLong(0), r.getInt(1),
              r.getString(2), r.getString(3)))
            got.synchronized { got ++= rs }; ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    assert(got.toSet == Set(
      (1L, 10, "insert", Fixtures.C1), (2L, 20, "insert", Fixtures.C1),
      (2L, 21, "update", Fixtures.C2), (3L, 30, "insert", Fixtures.C2),
      (1L, 10, "delete", Fixtures.C3)), s"got $got")
    val afterFirst = got.size

    // restart with MORE commits: only the NEW changes arrive (exactly-once
    // per commit range across restarts — same offset contract as the
    // incremental tail)
    w.upsert(rows((3, "a", 31)), $"k", $"p", Fixtures.C4)
    runOnce()
    assert(got.size == afterFirst + 1 &&
      got.contains((3L, 31, "update", Fixtures.C4)), s"got $got")
  }

  test("CDC mirror loop: stream cdc source → operation=cdc sink replicates deletes") {
    import org.apache.spark.sql.streaming.Trigger
    val src = freshDir("cdc_mirror_src")
    val dst = freshDir("cdc_mirror_dst")
    val ckpt = freshDir("cdc_mirror_ckpt")
    val w = new CowWriter(spark, src, numBuckets = 2)
    w.insert(rows((1, "a", 10), (2, "a", 20), (3, "b", 30)),
      $"k", $"p", Fixtures.C1)
    w.upsert(rows((2, "a", 21), (4, "b", 40)), $"k", $"p", Fixtures.C2)
    w.delete(rows((1, "a", 0)), $"k", $"p", Fixtures.C3)

    def mirrorOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("cdc", "true").load(src)
        .select($"k", $"p", $"v", col(ChangeFeed.ChangeType),
          col(ChangeFeed.ChangeCommitTs))
        .writeStream.format("graft")
        .option("key", "k").option("partition", "p")
        .option("operation", "cdc").option("buckets", "2")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination(120000)
    }
    mirrorOnce()
    def snap(dir: String) = graft.read.SnapshotReader.read(spark, dir)
      .select($"k", $"v").as[(Long, Int)].collect().toSet
    // the mirror equals the source snapshot — INCLUDING the delete of key 1
    assert(snap(dst) == snap(src))
    assert(snap(dst) == Set((2L, 21), (3L, 30), (4L, 40)))

    // more source churn (incl. a delete and a re-insert), mirror again
    w.delete(rows((2, "a", 0)), $"k", $"p", Fixtures.C4)
    w.upsert(rows((1, "a", 12)), $"k", $"p", "20260105000000")
    mirrorOnce()
    assert(snap(dst) == snap(src))
    assert(snap(dst) == Set((1L, 12), (3L, 30), (4L, 40)))

    // a single multi-commit batch must apply the NEWEST change per key:
    // fresh mirror, no rate limit → ONE batch carries insert+update+delete
    // chains; the net state must land (not a fixed delete-wins collapse)
    val dst2 = freshDir("cdc_mirror_dst2")
    val ckpt2 = freshDir("cdc_mirror_ckpt2")
    val q2 = spark.readStream.format("graft")
      .option("cdc", "true").load(src)
      .select($"k", $"p", $"v", col(ChangeFeed.ChangeType),
        col(ChangeFeed.ChangeCommitTs))
      .writeStream.format("graft")
      .option("key", "k").option("partition", "p")
      .option("operation", "cdc").option("buckets", "2")
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start(dst2)
    q2.awaitTermination(120000)
    assert(snap(dst2) == snap(src),
      "bootstrap mirror from one multi-commit batch must match the source")
  }

  test("format surface: cdc option equals the API and validates its inputs") {
    val dir = freshDir("cdc_fmt")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(rows((1, "a", 10)), $"k", $"p", Fixtures.C1)
    w.upsert(rows((1, "a", 11)), $"k", $"p", Fixtures.C2)

    val viaFmt = spark.read.format("graft")
      .option("from", "0").option("cdc", "true").load(dir)
      .select($"k", $"v", col(ChangeFeed.ChangeType),
        col(ChangeFeed.ChangeCommitTs))
      .as[(Long, Int, String, String)].collect().toSet
    assert(viaFmt == Set((1L, 10, "insert", Fixtures.C1),
      (1L, 11, "update", Fixtures.C2)))

    // pushed filters still apply row-level through the shared scan trait
    val filtered = spark.read.format("graft")
      .option("from", "0").option("cdc", "true").load(dir)
      .filter(col(ChangeFeed.ChangeType) === "update")
    assert(filtered.count() == 1)

    // cdc without from is refused
    val err = intercept[IllegalArgumentException](
      spark.read.format("graft").option("cdc", "true").load(dir))
    assert(err.getMessage.contains("requires"))
  }
}
