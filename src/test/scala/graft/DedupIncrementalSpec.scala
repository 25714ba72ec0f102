package graft

import graft.pipeline.Dedup
import graft.read.SnapshotReader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DedupIncrementalSpec extends SparkSpec {
  import spark.implicits._
  import Fixtures.{C1, C2, C3}

  private val lorem = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("ingest reaches the batch-mode kept set; history verdicts settle") {
    val dir = freshDir("incdedup_basic")
    // batch 1: two unique docs + an internal near-dup pair (2 ~ 1)
    val b1 = docs(1L -> lorem, 2L -> (lorem + " extra"),
      3L -> "completely different words entirely unrelated content here now")
    // batch 2: 11 duplicates batch-1's doc 1 (cross-batch); 12 unique;
    // 13 duplicates the DROPPED doc 2 — must still be dropped (dedup is
    // against all SEEN docs, not just survivors)
    val b2 = docs(11L -> lorem, 12L -> ("zeta " * 12).trim,
      13L -> (lorem + " extra"))
    Dedup.ingestDedup(spark, dir, b1, col("doc_id"), col("text"),
      ts = Some(C1))
    val snap2 = Dedup.ingestDedup(spark, dir, b2, col("doc_id"), col("text"),
      ts = Some(C2))
    val kept = snap2.filter(col("kept")).select("doc_id").as[Long]
      .collect().toSet
    assert(kept == Set(1L, 3L, 12L))
    // equals ONE batch-mode pass over the union
    val all = b1.unionByName(b2)
    val batchDrops = Dedup.dropIdsFromPairs(Dedup.minhashPairs(all,
      col("doc_id"), col("text"))).as[Long].collect().toSet
    assert(kept == all.select("doc_id").as[Long].collect().toSet -- batchDrops)
    // batch-1 verdicts are untouched by batch 2 (history is settled)
    val snap1 = SnapshotReader.read(spark, dir, asOf = Some(C1))
    assert(snap1.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(snap1.filter(col("kept")).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 3L))
  }

  test("re-ingesting a batch upserts the same keys with the same verdicts") {
    val dir = freshDir("incdedup_reingest")
    val b1 = docs(1L -> lorem, 2L -> (lorem + " extra"))
    Dedup.ingestDedup(spark, dir, b1, col("doc_id"), col("text"),
      ts = Some(C1))
    val snap = Dedup.ingestDedup(spark, dir, b1, col("doc_id"), col("text"),
      ts = Some(C2))
    // same rows, same verdicts, no duplicated keys
    assert(snap.count() == 2)
    assert(snap.filter(col("kept")).select("doc_id").as[Long]
      .collect().toSet == Set(1L))
  }

  test("streaming ingest: foreachBatch + ingestDedup dedups a document " +
    "stream batch by batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshDir("incdedup_stream")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Dedup.ingestDedup(spark, dir, batch, col("doc_id"), col("text"))
        ()
      }
      .start()
    try {
      mem.addData(1L -> lorem, 2L -> (lorem + " extra"))
      q.processAllAvailable()
      mem.addData(11L -> lorem,
        12L -> "unrelated words forming a genuinely different document body")
      q.processAllAvailable()
    } finally q.stop()
    // within-batch dup 2 and cross-batch dup 11 dropped; two index commits
    val snap = SnapshotReader.read(spark, dir)
    assert(snap.count() == 4)
    assert(snap.filter(col("kept")).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 12L))
    assert(graft.format.Timeline(spark.sessionState.newHadoopConf(), dir)
      .completedInstants().size == 2)
  }

  test("the index is a real graft table: sketch columns round-trip and " +
    "the change feed sees each batch") {
    val dir = freshDir("incdedup_table")
    Dedup.ingestDedup(spark, dir, docs(1L -> lorem), col("doc_id"),
      col("text"), ts = Some(C1))
    Dedup.ingestDedup(spark, dir, docs(2L -> "unrelated text body here"),
      col("doc_id"), col("text"), ts = Some(C3))
    val snap = SnapshotReader.read(spark, dir)
    // sig is the real MinHash signature (32 longs), shingles non-empty
    val r = snap.filter(col("doc_id") === 1L)
      .select(size(col("sig")), size(col("shingles"))).head()
    assert(r.getInt(0) == 32 && r.getInt(1) > 0)
    // incremental read between the two commits sees only batch 2
    val inc = spark.read.format("graft")
      .option("from", C1).load(dir)
    assert(inc.select("doc_id").as[Long].collect().toSet == Set(2L))
  }
}
