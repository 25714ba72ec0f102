package graft

import graft.format.Timeline
import graft.read.SnapshotReader
import graft.write.{MorWriter, TableMaintenance}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Bucket rescale: one layout-only CLUSTER commit re-routes every current
  * row by the new count; readers and writers resolve the count AS OF their
  * snapshot instant, so routing and pruning stay exact on both sides. */
class RebucketSpec extends SparkSpec {
  import spark.implicits._

  private val C1 = Fixtures.C1
  private val C2 = Fixtures.C2
  private val C3 = Fixtures.C3
  private val C4 = Fixtures.C4

  private lazy val orders =
    spark.read.parquet(s"$sf0001/orders.parquet").limit(400)

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    scans.map(s => s.relation.location
      .listFiles(s.partitionFilters, s.dataFilters)
      .map(_.files.length).sum).sum
  }

  private def payload(df: org.apache.spark.sql.DataFrame) =
    df.select(orders.columns.map(col).toIndexedSeq: _*)
      .orderBy($"o_orderkey").collect().toSeq

  test("grow: snapshot identical, stale old groups superseded, appends " +
    "route by the new count") {
    val dir = freshDir("orders_rebucket_grow")
    val k = col("o_orderkey")
    orders.write.format("graft")
      .option("key", "o_orderkey").option("partition", "o_orderstatus")
      .option("buckets", "2").option("ts", C1).save(dir)
    orders.filter(k % 7 === 0).write.format("graft").mode("append")
      .option("operation", "delete").option("ts", C2).save(dir)
    val before = payload(SnapshotReader.read(spark, dir))

    val newFids = TableMaintenance.rebucket(spark, dir, C3, newBuckets = 5)
    assert(newFids.nonEmpty)
    val after = SnapshotReader.read(spark, dir)
    assert(payload(after) == before) // layout-only: rows unchanged
    // no key is served twice (old-era groups fully superseded)
    assert(after.groupBy("o_orderkey").count().filter($"count" > 1)
      .count() == 0)
    // the new count is the recorded one; the OLD count still resolves
    // for reads AS OF the pre-rebucket instant
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    assert(tl.recordedExtraAsOf("buckets", None).contains("5"))
    assert(tl.recordedExtraAsOf("buckets", Some(C2)).contains("2"))
    assert(payload(SnapshotReader.read(spark, dir, Some(C2))) == before)

    // an append WITHOUT a buckets option routes by the rescaled count...
    orders.filter(k === 3).withColumn("o_totalprice", lit(1.0))
      .write.format("graft").mode("append").option("ts", C4).save(dir)
    val head = SnapshotReader.read(spark, dir)
    assert(head.filter($"o_orderkey" === 3).count() == 1) // no duplicate
    assert(head.filter($"o_orderkey" === 3)
      .select("o_totalprice").as[Double].head() == 1.0)
    // ...and a contradicting explicit option is refused
    assertThrows[IllegalArgumentException] {
      orders.limit(1).write.format("graft").mode("append")
        .option("buckets", "2").save(dir)
    }
  }

  test("key lookup after the rescale plans one group per partition at " +
    "the NEW grain") {
    val dir = freshDir("orders_rebucket_prune")
    orders.write.format("graft")
      .option("key", "o_orderkey").option("partition", "o_orderstatus")
      .option("buckets", "2").option("ts", C1).save(dir)
    TableMaintenance.rebucket(spark, dir, C2, newBuckets = 7)
    val snap = spark.read.format("graft").load(dir)
    val parts = snap.select("o_orderstatus").distinct().count().toInt
    val look = snap
      .filter(col(graft.format.MetaCols.RecordKey) === "3")
    assert(look.count() == 1)
    // bucket pruning with the post-rescale count: ≤ 1 file per partition
    // (7 groups per partition exist; without pruning this would plan all)
    val planned = plannedFiles(look)
    assert(planned <= parts,
      s"expected ≤ $parts files (one group per partition), got $planned")
    val total = snap.inputFiles.length
    assert(total > parts, s"fixture too small to prove pruning: $total")
  }

  test("shrink: MOR deltas fold in; emptied groups vanish; history silent") {
    val dir = freshDir("orders_rebucket_mor")
    val k = col("o_orderkey")
    val w = new MorWriter(spark, dir, numBuckets = 4)
    w.insert(orders, k, col("o_orderstatus"), C1)
    w.delete(orders.filter(k % 7 === 0), k, col("o_orderstatus"), C2)
    val before = payload(SnapshotReader.read(spark, dir))

    TableMaintenance.rebucket(spark, dir, C3, newBuckets = 2)
    val after = SnapshotReader.read(spark, dir)
    assert(payload(after) == before)
    // every served file is from the rescale commit (deltas folded, old
    // slices superseded)
    assert(after.inputFiles.forall(_.contains(s"_$C3")))
    // layout-only: the change feed and incremental read emit nothing
    assert(graft.read.ChangeFeed.read(spark, dir, C2, C3).count() == 0)
    assert(graft.read.IncrementalReader.read(spark, dir, C2, C3)
      .count() == 0)
  }
}
