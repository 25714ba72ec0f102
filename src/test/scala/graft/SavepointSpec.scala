package graft

import graft.format.Timeline
import graft.read.SnapshotReader
import graft.write.{CowWriter, TableMaintenance}
import org.apache.spark.sql.functions._

/** Savepoints: pinned snapshots the cleaner cannot reclaim, archival will
  * not pass, and restore can return to. */
class SavepointSpec extends SparkSpec {
  import spark.implicits._

  private val C1 = Fixtures.C1
  private val C2 = Fixtures.C2
  private val C3 = Fixtures.C3
  private val C4 = Fixtures.C4

  private lazy val orders =
    spark.read.parquet(s"$sf0001/orders.parquet").limit(400)

  /** C1 insert, C2 delete %7, C3 price bump %10==3, C4 delete %11==5 —
    * the shared fixture script, on a fresh dir. */
  private def build(dirName: String): String = {
    val dir = freshDir(dirName)
    val k = col("o_orderkey")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(orders, k, col("o_orderstatus"), C1)
    w.delete(orders.filter(k % 7 === 0), k, col("o_orderstatus"), C2)
    w.upsert(orders.filter(k % 10 === 3 && k % 7 =!= 0)
      .withColumn("o_totalprice", $"o_totalprice" + 100000),
      k, col("o_orderstatus"), C3)
    w.delete(orders.filter(k % 11 === 5 && k % 7 =!= 0),
      k, col("o_orderstatus"), C4)
    dir
  }

  private def countC2 = orders.filter($"o_orderkey" % 7 =!= 0).count()

  test("clean keeps a savepointed snapshot it would otherwise reclaim") {
    // positive control: WITHOUT a savepoint, clean(1) breaks asOf(C2)
    val bare = build("orders_sp_bare")
    TableMaintenance.clean(spark, bare, retainCommits = 1)
    assertThrows[Exception] { // slices reclaimed: planning or scan fails
      SnapshotReader.read(spark, bare, Some(C2)).count()
    }

    val dir = build("orders_sp_keep")
    TableMaintenance.savepoint(spark, dir, C2)
    val deleted = TableMaintenance.clean(spark, dir, retainCommits = 1)
    // C2's snapshot still serves exactly
    assert(SnapshotReader.read(spark, dir, Some(C2)).count() == countC2)
    // and the cleaner still reclaimed SOMETHING (C1-only slices C2
    // doesn't reach — the groups C2's delete rewrote)
    assert(deleted.nonEmpty)

    // released → the next clean reclaims, and asOf(C2) stops serving
    TableMaintenance.releaseSavepoint(spark, dir, C2)
    assert(TableMaintenance.clean(spark, dir, retainCommits = 1).nonEmpty)
    assertThrows[Exception] {
      SnapshotReader.read(spark, dir, Some(C2)).count()
    }
  }

  test("restore returns to the pinned snapshot; rollback refuses to " +
    "delete a savepointed instant") {
    val dir = build("orders_sp_restore")
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    tl.savepoint(C2)
    tl.savepoint(C3)
    assert(tl.savepoints() == Seq(C2, C3))

    // restoring to C2 would delete the savepointed C3 — refused
    assertThrows[IllegalArgumentException] {
      TableMaintenance.restore(spark, dir, C2)
    }
    // restore targets must BE savepoints
    assertThrows[IllegalArgumentException] {
      TableMaintenance.restore(spark, dir, C4)
    }
    tl.releaseSavepoint(C3)
    val removed = TableMaintenance.restore(spark, dir, C2)
    assert(removed == Seq(C4, C3))
    assert(SnapshotReader.read(spark, dir).count() == countC2)
    // the savepoint survives its own restore (still listed, still pinned)
    assert(Timeline(spark.sessionState.newHadoopConf(), dir)
      .savepoints() == Seq(C2))
  }

  test("archival stops before the oldest savepoint so restore keeps working") {
    val dir = build("orders_sp_archive")
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    tl.savepoint(C2)
    // would archive C1..C3 with keepActive=1; the savepoint caps it at C1
    val archived = tl.archive(keepActive = 1)
    assert(archived == Seq(C1))
    val tl2 = Timeline(spark.sessionState.newHadoopConf(), dir)
    assert(tl2.isActive(C2) && tl2.isActive(C3) && tl2.isActive(C4))
    assert(!tl2.isActive(C1))
    // restore through the archived boundary still works (C3/C4 active)
    TableMaintenance.restore(spark, dir, C2)
    assert(SnapshotReader.read(spark, dir).count() == countC2)

    // savepointing an ARCHIVED instant is refused (its files may be gone)
    val dir2 = build("orders_sp_archived_refuse")
    val t2 = Timeline(spark.sessionState.newHadoopConf(), dir2)
    t2.archive(keepActive = 1)
    assertThrows[IllegalArgumentException] { t2.savepoint(C1) }
  }
}
