package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** [[Dedup.semIngestDedup]]: arrival-order ingest through the
  * cluster-partitioned semantic index must converge to batch-mode
  * [[Dedup.semDedupKeep]], and the index's partition layout must actually
  * prune — a read of one cluster's history touches only that cluster's
  * partition directory. */
class SemDedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_test/sem_ingest_idx"
  private val anchors = Dedup.rademacherAnchors(4, 8, seed = 3L)

  private def corpus(n: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(99L)
    // planted near-dup pairs: every third vector is a copy of its
    // predecessor with a tiny perturbation (cosine ~ 1)
    val base = Seq.fill(n)(Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    base.zipWithIndex.map { case (v, i) =>
      val w = if (i % 3 == 2) base(i - 1).map(_ * 1.001f) else v
      (i.toLong, w.map(_.toFloat): Seq[Float])
    }
  }

  test("three-batch ingest == batch-mode semDedupKeep; verdicts settled") {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val rows = corpus(30)
    val df = rows.toDF("vec_id", "embedding")
    val batchKeeps = Dedup.semDedupKeep(df, $"vec_id", $"embedding",
        anchors, thresholdNum = 9, thresholdDen = 10)
      .as[(Long, Int)].collect().toSet
    for (i <- 0 until 3)
      Dedup.semIngestDedup(spark, dir,
        df.filter($"vec_id" >= i * 10 && $"vec_id" < (i + 1) * 10),
        $"vec_id", $"embedding", anchors,
        thresholdNum = 9, thresholdDen = 10)
    val idx = read.SnapshotReader.read(spark, dir)
    val ingestKeeps = idx.filter($"kept")
      .select($"doc_id", $"cl").as[(Long, Int)].collect().toSet
    assert(ingestKeeps == batchKeeps)
    // the planted copies were actually dropped (the test has teeth)
    assert(ingestKeeps.size < rows.size)
    // every doc has exactly one verdict row — kept or dropped
    assert(idx.count() == rows.size)
  }

  test("a null/wrong-dimension embedding neither crashes the ingest nor " +
    "loses the row: it lands KEPT in the 'none' partition (batch parity)") {
    val d = "/tmp/graft_test/sem_ingest_null"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    val good = corpus(9)
    val batch = (good :+ (100L, null.asInstanceOf[Seq[Float]]) :+
      (101L, Seq(1.0f, 2.0f))) // wrong dimension (anchors are 8-d)
      .toDF("vec_id", "embedding")
    val out = Dedup.semIngestDedup(spark, d, batch,
      col("vec_id"), col("embedding"), anchors,
      thresholdNum = 2, thresholdDen = 5)
    val clusterless = out.filter(col("doc_id") >= 100L)
      .select(col("doc_id"), col("kept"),
        col(graft.format.MetaCols.PartitionPath).as("pt"))
      .as[(Long, Boolean, String)].collect().toSeq.sortBy(_._1)
    assert(clusterless == Seq((100L, true, "none"), (101L, true, "none")))
    // batch parity: semDedupKeep also keeps both rows
    val kept = Dedup.semDedupKeep(batch, col("vec_id"), col("embedding"),
      anchors, thresholdNum = 2, thresholdDen = 5)
      .select(col("id")).as[Long].collect().toSet
    assert(kept.contains(100L) && kept.contains(101L))
  }

  test("index reads partition-prune to the queried cluster only") {
    // (depends on the table built by the previous test)
    val idx = read.SnapshotReader.read(spark, dir)
    val cells = idx.select($"pt").distinct().as[String].collect().sorted
    assert(cells.length > 1, "corpus must span several clusters")
    val one = cells.head
    // the ingest's own read path (r14): the catalog-mounted native scan
    // with a `pt` partition filter — planned input partitions must narrow
    // to the queried cluster's file groups, a STATIC metadata prune
    def scanParts(q: org.apache.spark.sql.DataFrame): Int =
      q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => b.inputPartitions.length
      }.sum
    val full = graft.util.CatalogMount.table(spark, dir)
    val pruned = full.filter($"pt" === one)
    assert(scanParts(pruned) > 0 && scanParts(pruned) < scanParts(full),
      s"pt prune did not narrow planned slices: " +
        s"${scanParts(pruned)} vs ${scanParts(full)}")
    // and the pruned read still answers correctly
    assert(pruned.count() == idx.filter($"pt" === one).count())
  }

  test("verify joins keep the pair frame exchange-free: the union side " +
    "broadcasts (the r13 de-broadcast regression, pinned)") {
    // (depends on the table built by the first test) — drive one more
    // batch through the ingest and assert its drops-plan joins the
    // candidate-pair frame against BROADCAST sides only
    val batch = Seq((200L, Seq.fill(8)(0.5f): Seq[Float])).toDF(
      "vec_id", "embedding")
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(f: String, qe: org.apache.spark.sql.execution
          .QueryExecution, d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString: Unit }
      def onFailure(f: String, qe: org.apache.spark.sql.execution
          .QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      Dedup.semIngestDedup(spark, dir, batch, $"vec_id", $"embedding",
        anchors, thresholdNum = 9, thresholdDen = 10)
      org.apache.spark.sql.graft.Bridge.waitForListeners(
        spark.sparkContext)
    } finally spark.listenerManager.unregister(l)
    // every join KEYED on id_a/id_b consumes the candidate-pair frame
    // (the bucketed self-join that PRODUCES pairs keys on band/bucket) —
    // each must be a BroadcastHashJoin: a sort-merge or shuffled-hash
    // join there means the quadratic pair side moved through an exchange,
    // the exact r13 de-broadcast regression
    val exchanged = raw"(SortMergeJoin|ShuffledHashJoin) \[(id_a|id_b)#".r
    val offenders = plans.synchronized {
      plans.filter(p => exchanged.findFirstIn(p).nonEmpty)
    }
    assert(offenders.isEmpty,
      s"pair-frame join left broadcast:\n${offenders.headOption.getOrElse("")}")
  }
}
