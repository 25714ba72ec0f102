package graft

import graft.format.Timeline
import graft.read.SnapshotReader
import graft.write.{CowWriter, TableMaintenance}
import org.apache.spark.sql.functions._

/** Rollback + cleaner over a COW table. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val C1 = Fixtures.C1
  private val C2 = Fixtures.C2
  private val C3 = Fixtures.C3

  private lazy val orders =
    spark.read.parquet(s"$sf0001/orders.parquet").limit(400)

  private def build(dirName: String): String = {
    val dir = freshDir(dirName)
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(orders, col("o_orderkey"), col("o_orderstatus"), C1)
    w.delete(orders.filter($"o_orderkey" % 7 === 0),
      col("o_orderkey"), col("o_orderstatus"), C2)
    w.upsert(orders.filter($"o_orderkey" % 10 === 3 && $"o_orderkey" % 7 =!= 0)
      .withColumn("o_totalprice", $"o_totalprice" + 100000),
      col("o_orderkey"), col("o_orderstatus"), C3)
    dir
  }

  test("rollback removes later commits, their files, and their caches") {
    val dir = build("orders_maint_rb")
    val preC2 = SnapshotReader.read(spark, dir, Some(C2))
      .select(orders.columns.map(col).toIndexedSeq: _*).collect()
    // materialize a delete-view cache for a commit that will be rolled back?
    // C3 deleted nothing, so materialize C2's (which SURVIVES rollback to C2)
    graft.deleteview.DeleteView(spark, dir, C2).toDF().count()

    val rolled = TableMaintenance.rollback(spark, dir, C2)
    assert(rolled == Seq(C3))
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    assert(tl.completedInstants().map(_.ts) == Seq(C1, C2))
    // head snapshot now equals the old as-of-C2 state
    val snap = SnapshotReader.read(spark, dir)
      .select(orders.columns.map(col).toIndexedSeq: _*).collect()
    assert(snap.length == preC2.length)
    // no file from C3 remains anywhere in the table dir
    val fs = tl.fs
    val leftover = new scala.collection.mutable.ArrayBuffer[String]
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    while (it.hasNext) {
      val f = it.next().getPath.getName
      if (f.contains(s"_$C3")) leftover += f
    }
    assert(leftover.isEmpty, s"rolled-back files remain: $leftover")
    // the surviving delete view still serves
    assert(graft.deleteview.DeleteView(spark, dir, C2).toDF().count() ==
      orders.filter($"o_orderkey" % 7 === 0).count())

    // the FORMAT surface agrees with the rolled-back state (fresh relation
    // per read — no stale planning), and a post-rollback append through
    // the format lands as the new head
    assert(spark.read.format("graft").load(dir).count() == preC2.length)
    orders.filter($"o_orderkey" % 10 === 4 && $"o_orderkey" % 7 =!= 0)
      .withColumn("o_totalprice", $"o_totalprice" + 7)
      .write.format("graft")
      .option("key", "o_orderkey").option("partition", "o_orderstatus")
      .option("buckets", "2").option("ts", C3).mode("append").save(dir)
    assert(Timeline(spark.sessionState.newHadoopConf(), dir)
      .completedInstants().map(_.ts) == Seq(C1, C2, C3))
    assert(spark.read.format("graft")
      .option("from", C2).load(dir).count() ==
      orders.filter($"o_orderkey" % 10 === 4 && $"o_orderkey" % 7 =!= 0)
        .count())
  }

  test("clean deletes only slices unreachable within the retention window") {
    val dir = build("orders_maint_clean")
    val headBefore = SnapshotReader.read(spark, dir).count()
    val c2Before = SnapshotReader.read(spark, dir, Some(C2)).count()

    val deleted = TableMaintenance.clean(spark, dir, retainCommits = 2)
    assert(deleted.nonEmpty, "C1 slices of groups rewritten later must go")
    deleted.foreach(rel => assert(rel.contains(s"_$C1"),
      s"only pre-window slices may be deleted, got $rel"))

    // everything inside the window still serves, byte-identical counts
    assert(SnapshotReader.read(spark, dir).count() == headBefore)
    assert(SnapshotReader.read(spark, dir, Some(C2)).count() == c2Before)

    // retention >= #commits is a no-op
    assert(TableMaintenance.clean(spark, dir, retainCommits = 10).isEmpty)
  }
}
