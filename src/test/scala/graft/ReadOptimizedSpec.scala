package graft

import graft.read.SnapshotReader
import graft.sources.GraftTable
import graft.write.MorWriter
import org.apache.spark.sql.functions._

/** READ-OPTIMIZED view (Hudi's RO query): base files only, outstanding
  * deltas skipped — staleness bounded by compaction lag, plan always the
  * COW fast path. */
class ReadOptimizedSpec extends SparkSpec {
  import Fixtures.{C1, C2, C3, C3x, C4}

  test("RO = the last compaction state; RT sees the delta delete; " +
    "engine API = format option; plan has no shuffle") {
    val dir = Fixtures.morDir(spark, sf0001)
    val t = GraftTable(spark, dir)
    val ro = t.readOptimized()
    // RO == snapshot asOf the compaction instant (C4 is delta-only)
    val asOfCompaction = t.asOf(C3x).select(ro.columns.map(col): _*)
    assert(ro.except(asOfCompaction).count() == 0 &&
      asOfCompaction.except(ro).count() == 0)
    // RT (the merged snapshot) differs: C4's deletes are visible there
    assert(ro.count() > t.snapshot().count())
    // format surface serves the identical view
    val fmt = spark.read.format("graft").option("readOptimized", "true")
      .load(dir).select(ro.columns.map(col): _*)
    assert(fmt.except(ro).count() == 0 && ro.except(fmt).count() == 0)
    // the RO plan is the COW fast path: no exchange anywhere
    assert(!ro.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("COW tables and fully-compacted MOR states: RO == snapshot") {
    val cow = GraftTable(spark, Fixtures.cowDir(spark, sf0001))
    assert(cow.readOptimized().except(cow.snapshot()).count() == 0 &&
      cow.snapshot().except(cow.readOptimized()).count() == 0)
    // compact a MOR table to its head: RO catches up to RT
    val dir = freshDir("ro_compacted")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(200)
    val k = col("o_orderkey")
    val w = new MorWriter(spark, dir, numBuckets = 2)
    w.insert(orders, k, col("o_orderstatus"), C1)
    w.delete(orders.filter(k % 3 === 0), k, col("o_orderstatus"), C2)
    val t = GraftTable(spark, dir)
    assert(t.readOptimized().count() == 200) // delta delete invisible
    w.compact(C3)
    assert(t.readOptimized().except(t.snapshot()).count() == 0 &&
      t.snapshot().except(t.readOptimized()).count() == 0)
    // asOf composes: RO as of C2 still serves the C1 base state
    assert(t.readOptimized(asOf = Some(C2)).count() == 200)
  }

  test("readOptimized refuses range/cdc/deleteView shapes") {
    val dir = Fixtures.morDir(spark, sf0001)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readOptimized", "true")
        .option("from", C1).load(dir)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readOptimized", "true")
        .option("deleteView", C4).load(dir)
    }
  }
}
