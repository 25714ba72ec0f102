package graft

import graft.read.{ChangeFeed, SnapshotReader}
import graft.write.{CowWriter, MorWriter, TableMaintenance}
import org.apache.spark.sql.functions._

/** Event-time ordering (the Hudi precombine analog): the row version with
  * the greatest ordering value wins an upsert regardless of arrival order;
  * deletes stay absolute (commit-ordered). */
class PrecombineSpec extends SparkSpec {
  import spark.implicits._

  private val C1 = Fixtures.C1
  private val C2 = Fixtures.C2
  private val C3 = Fixtures.C3
  private val C4 = Fixtures.C4

  // (key, partition, event-time, value)
  private def rows(n: Int, ord: Int, tag: String) =
    (1 to n).map(i => (i.toLong, s"p${i % 2}", ord, s"$tag$i"))
      .toDF("k", "p", "ev", "v")

  test("COW: stale upsert loses, fresh wins; winner keeps its own meta") {
    val dir = freshDir("pc_cow")
    val w = new CowWriter(spark, dir, numBuckets = 2,
      precombine = Some("ev"))
    w.insert(rows(100, ord = 5, tag = "base"), $"k", $"p", C1)
    // half the batch is STALE (ev=3 < 5), half FRESH (ev=7 > 5)
    val mixed = rows(100, 3, "stale").filter($"k" % 2 === 0)
      .union(rows(100, 7, "fresh").filter($"k" % 2 === 1))
    w.upsert(mixed, $"k", $"p", C2)
    val snap = SnapshotReader.read(spark, dir).cache()
    assert(snap.count() == 100)
    // stale rows did NOT overwrite; fresh did
    assert(snap.filter($"k" % 2 === 0 && $"v".startsWith("base")).count() == 50)
    assert(snap.filter($"k" % 2 === 1 && $"v".startsWith("fresh")).count() == 50)
    // a kept old row keeps its ORIGINAL commit time; winners carry C2
    import graft.format.MetaCols
    assert(snap.filter($"k" % 2 === 0)
      .select(MetaCols.CommitTime).distinct().as[String].collect()
      .toSeq == Seq(C1))
    assert(snap.filter($"k" % 2 === 1)
      .select(MetaCols.CommitTime).distinct().as[String].collect()
      .toSeq == Seq(C2))
    // equal ordering: incoming wins (tie goes to the newer commit)
    w.upsert(rows(100, 7, "tie").filter($"k" % 2 === 1), $"k", $"p", C3)
    val snap3 = SnapshotReader.read(spark, dir)
    assert(snap3.filter($"v".startsWith("tie")).count() == 50)
    snap.unpersist()
  }

  test("COW: numUpdateWrites counts only genuine (winning) updates") {
    val dir = freshDir("pc_cow_counts")
    val w = new CowWriter(spark, dir, numBuckets = 2,
      precombine = Some("ev"))
    w.insert(rows(40, 5, "base"), $"k", $"p", C1)
    val mixed = rows(40, 3, "stale").filter($"k" <= 10)
      .union(rows(40, 9, "fresh").filter($"k" > 30))
    w.upsert(mixed, $"k", $"p", C2)
    val tl = graft.format.Timeline(
      spark.sessionState.newHadoopConf(), dir)
    val updates = tl.metadata(C2).allStats.map(_._2.numUpdateWrites).sum
    assert(updates == 10, s"expected 10 winning updates, got $updates")
  }

  test("MOR: merge resolves by ordering; compaction preserves it; " +
    "deletes stay absolute") {
    val dir = freshDir("pc_mor")
    rows(100, 5, "base").write.format("graft")
      .option("key", "k").option("partition", "p")
      .option("type", "mor").option("buckets", "2")
      .option("precombine", "ev").option("ts", C1).save(dir)
    // stale delta: snapshot must NOT change
    rows(100, 3, "stale").write.format("graft").mode("append")
      .option("ts", C2).save(dir)
    val snap = SnapshotReader.read(spark, dir)
    assert(snap.filter($"v".startsWith("base")).count() == 100)
    // fresh delta wins
    rows(100, 8, "fresh").filter($"k" <= 30).write.format("graft")
      .mode("append").option("ts", C3).save(dir)
    val snap3 = SnapshotReader.read(spark, dir).cache()
    assert(snap3.filter($"v".startsWith("fresh")).count() == 30)
    assert(snap3.filter($"v".startsWith("base")).count() == 70)
    snap3.unpersist()
    // compaction folds with the same resolution
    val w = new MorWriter(spark, dir, numBuckets = 2)
    w.compact(C4)
    val snap4 = SnapshotReader.read(spark, dir).cache()
    assert(snap4.filter($"v".startsWith("fresh")).count() == 30)
    assert(snap4.filter($"v".startsWith("base")).count() == 70)
    assert(snap4.count() == 100)
    snap4.unpersist()
    // deletes are ABSOLUTE: removing a high-ordering row works, and a
    // later (re)insert with LOWER ordering resurrects the key
    rows(100, 1, "re").filter($"k" === 7).write.format("graft")
      .mode("append").option("operation", "delete")
      .option("ts", "20260105000000").save(dir)
    val afterDel = SnapshotReader.read(spark, dir)
    assert(afterDel.filter($"k" === 7).count() == 0)
    rows(100, 1, "re").filter($"k" === 7).write.format("graft")
      .mode("append").option("ts", "20260106000000").save(dir)
    val afterRe = SnapshotReader.read(spark, dir)
    assert(afterRe.filter($"k" === 7 && $"v" === "re7").count() == 1)
  }

  test("CDC: a stale delta emits no change; fresh emits update") {
    val dir = freshDir("pc_cdc")
    rows(50, 5, "base").write.format("graft")
      .option("key", "k").option("partition", "p")
      .option("type", "mor").option("buckets", "2")
      .option("precombine", "ev").option("ts", C1).save(dir)
    rows(50, 3, "stale").filter($"k" <= 20).write.format("graft")
      .mode("append").option("ts", C2).save(dir)
    rows(50, 8, "fresh").filter($"k" > 40).write.format("graft")
      .mode("append").option("ts", C3).save(dir)
    val feed = ChangeFeed.read(spark, dir, C1, C3).cache()
    // the stale commit contributes NOTHING; the fresh one 10 updates
    assert(feed.filter(col(ChangeFeed.ChangeCommitTs) === C2).count() == 0)
    val fresh = feed.filter(col(ChangeFeed.ChangeCommitTs) === C3)
    assert(fresh.count() == 10)
    assert(fresh.select(col(ChangeFeed.ChangeType)).distinct()
      .as[String].collect().toSeq == Seq("update"))
    feed.unpersist()
  }

  test("SQL UPDATE resolves by the recorded ordering column too") {
    val dir = freshDir("pc_sqldml")
    rows(30, 5, "base").write.format("graft")
      .option("key", "k").option("partition", "p")
      .option("precombine", "ev").option("buckets", "2")
      .option("ts", C1).save(dir)
    spark.sql("DROP TABLE IF EXISTS g_pc")
    spark.sql(s"CREATE TABLE g_pc USING graft OPTIONS (path '$dir')")
    try {
      // back-dating the event time makes the UPDATE a stale write: it
      // loses the resolution exactly like a stale batch upsert
      spark.sql("UPDATE g_pc SET ev = 1, v = 'stale' WHERE k <= 10")
      assert(spark.sql(
        "SELECT count(*) FROM g_pc WHERE v = 'stale'").head().getLong(0)
        == 0)
      // keeping the event time (tie) applies — ties go to the newer commit
      spark.sql("UPDATE g_pc SET v = 'bumped' WHERE k <= 10")
      assert(spark.sql(
        "SELECT count(*) FROM g_pc WHERE v = 'bumped'").head().getLong(0)
        == 10)
    } finally spark.sql("DROP TABLE g_pc")
  }

  test("declaration rules: append resolves recorded column; contradiction " +
    "and late declaration refuse; update frame must carry the column") {
    val dir = freshDir("pc_rules")
    rows(20, 5, "base").write.format("graft")
      .option("key", "k").option("partition", "p")
      .option("precombine", "ev").option("buckets", "2")
      .option("ts", C1).save(dir)
    // append without the option: recorded column applies (stale loses)
    rows(20, 1, "stale").write.format("graft").mode("append")
      .option("ts", C2).save(dir)
    assert(SnapshotReader.read(spark, dir)
      .filter($"v".startsWith("base")).count() == 20)
    assertThrows[IllegalArgumentException] {
      rows(20, 9, "x").write.format("graft").mode("append")
        .option("precombine", "v").option("ts", C3).save(dir)
    }
    // a table with NO recorded column refuses a late declaration
    val dir2 = freshDir("pc_rules2")
    rows(20, 5, "base").write.format("graft")
      .option("key", "k").option("partition", "p")
      .option("buckets", "2").option("ts", C1).save(dir2)
    assertThrows[IllegalArgumentException] {
      rows(20, 9, "x").write.format("graft").mode("append")
        .option("precombine", "ev").option("ts", C2).save(dir2)
    }
    // update frame missing the ordering column refuses
    val w = new CowWriter(spark, dir, numBuckets = 2,
      precombine = Some("ev"))
    assertThrows[IllegalArgumentException] {
      w.upsert(rows(20, 9, "y").drop("ev"), $"k", $"p", C4)
    }
  }
}
