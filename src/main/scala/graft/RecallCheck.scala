package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: asserts MinHash-LSH candidate recall is exactly 1 against the
  * brute-force inverted-index Jaccard at a given scale factor — the
  * precondition for q_minhash_pairs' brute-force oracle (PipelineSpec pins
  * it at sf0.001; run this against larger SFs after changing banding
  * parameters). */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lsh = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      n = 3, numHashes = 32, bands = 16, thresholdPermille = 500)
    val brute = Dedup.ngramJaccardPairsFullIndex(docs, col("doc_id"),
      col("text"), blocking = lit(1), n = 3, thresholdPermille = 500)
    val missed = brute.exceptAll(lsh).count()
    val extra = lsh.exceptAll(brute).count()
    println(s"[recall] sf=$sfDir minhash true=${brute.count()} lsh=${lsh.count()} " +
      s"missed=$missed extra=$extra ${if (missed + extra == 0) "PASS" else "FAIL"}")
    // Embedding near-dup: blocking is part of the shipped semantics (the
    // oracle mirrors it), so report the tail-recall curve rather than
    // asserting 1 — and assert precision (blocked ⊆ exact) instead.
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val blocked = Dedup.embeddingNearDupPairs(embs, col("vec_id"),
      col("embedding"), thresholdNum = 2, thresholdDen = 5)
    val allPairs = Dedup.embeddingNearDupPairsAllPairs(embs, col("vec_id"),
      col("embedding"), thresholdNum = 2, thresholdDen = 5)
    val falsePos = blocked.exceptAll(allPairs).count()
    println(s"[recall] sf=$sfDir embed blocked=${blocked.count()} " +
      s"exactAllPairs=${allPairs.count()} falsePositives=$falsePos " +
      s"${if (falsePos == 0) "PASS" else "FAIL"}")
    spark.stop()
  }
}
