package graft

import graft.format.Timeline
import graft.read.{ChangeFeed, IncrementalReader, SnapshotReader}
import graft.write.{CowWriter, MorWriter, TableMaintenance}
import org.apache.spark.sql.functions._

/** Metadata-only partition drop: the snapshot stops serving the named
  * partitions instantly, with no data job at all. */
class PartitionDropSpec extends SparkSpec {
  import spark.implicits._

  private val C1 = Fixtures.C1
  private val C2 = Fixtures.C2
  private val C3 = Fixtures.C3

  private lazy val orders =
    spark.read.parquet(s"$sf0001/orders.parquet").limit(600)

  test("COW: dropped partition vanishes; history, siblings, and reuse " +
    "stay intact") {
    val dir = freshDir("pdrop_cow")
    val k = col("o_orderkey")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(orders, k, col("o_orderstatus"), C1)
    val before = SnapshotReader.read(spark, dir)
    val fCount = before.filter($"o_orderstatus" === "F").count()
    val total = before.count()
    assert(fCount > 0)

    // the drop is METADATA-ONLY: zero Spark jobs may launch
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val superseded =
      try {
        val s = TableMaintenance.deletePartitions(spark, dir, C2, Seq("F"))
        org.apache.spark.sql.graft.Bridge
          .waitForListeners(spark.sparkContext)
        s
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() == 0,
      s"partition drop launched ${jobs.get()} Spark job(s); must be 0")
    assert(superseded.nonEmpty && superseded.forall(_.startsWith("F-")))
    val after = SnapshotReader.read(spark, dir)
    assert(after.filter($"o_orderstatus" === "F").count() == 0)
    assert(after.count() == total - fCount) // siblings untouched
    // a structural replace, not record deletes: delete view empty, change
    // feed and incremental silent
    assert(Timeline(spark.sessionState.newHadoopConf(), dir)
      .metadata(C2).totalRecordsDeleted == 0)
    assert(ChangeFeed.read(spark, dir, C1, C2).count() == 0)
    assert(IncrementalReader.read(spark, dir, C1, C2).count() == 0)
    // time travel BEFORE the drop still serves the partition
    assert(SnapshotReader.read(spark, dir, Some(C1))
      .filter($"o_orderstatus" === "F").count() == fCount)

    // re-inserting into the dropped partition starts fresh groups
    orders.filter($"o_orderstatus" === "F").limit(10)
      .write.format("graft").mode("append")
      .option("key", "o_orderkey").option("partition", "o_orderstatus")
      .option("ts", C3).save(dir)
    assert(SnapshotReader.read(spark, dir)
      .filter($"o_orderstatus" === "F").count() == 10)

    // the superseded files are reclaimable (and reclaimed) by clean
    val cleaned = TableMaintenance.clean(spark, dir, retainCommits = 1)
    assert(cleaned.exists(_.startsWith("F/")))
  }

  test("MOR: groups with outstanding deltas drop whole; unknown " +
    "partition refuses") {
    val dir = freshDir("pdrop_mor")
    val k = col("o_orderkey")
    val w = new MorWriter(spark, dir, numBuckets = 2)
    w.insert(orders, k, col("o_orderstatus"), C1)
    w.upsert(orders.filter($"o_orderstatus" === "F" && k % 3 === 0)
      .withColumn("o_totalprice", lit(1.0)),
      k, col("o_orderstatus"), C2)
    TableMaintenance.deletePartitions(spark, dir, C3, Seq("F"))
    val after = SnapshotReader.read(spark, dir)
    // the drop commit re-records the schema from the NEWEST recorder —
    // here a deltacommit — and must strip the MOR delete marker rather
    // than leak it into base-side schema resolution
    assert(!after.columns.contains(SnapshotReader.IsDeleted))
    assert(after.filter($"o_orderstatus" === "F").count() == 0)
    assert(after.count() ==
      orders.filter($"o_orderstatus" =!= "F").count())
    assertThrows[IllegalArgumentException] {
      TableMaintenance.deletePartitions(spark, dir, "20260105000000",
        Seq("NOPE"))
    }
  }
}
