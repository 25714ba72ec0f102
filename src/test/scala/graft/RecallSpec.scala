package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** CI recall gate at sf0.01 — the exact scale factor the driver's
  * CORRECTNESS comparison runs at. The q_minhash_pairs / q_dedup_fuzzy
  * oracles are brute-force exact-Jaccard SQL, so they are only valid if
  * MinHash-LSH banding recall is exactly 1 on this dataset at this SF; this
  * suite pins that (PipelineSpec pins sf0.001). Run graft.RecallCheck
  * manually for larger SFs / after changing banding parameters.
  *
  * The embedding near-dup oracle does NOT need a recall assumption (its
  * blocking is deterministic and mirrored in the oracle SQL); here we pin
  * its precision side: every emitted pair is verified by the independent
  * all-pairs formulation.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.01"
  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("sf0.01: minhash LSH == exact brute force (oracle precondition)") {
    val lsh = Dedup.minhashPairs(docs, $"doc_id", $"text",
      n = 3, numHashes = 32, bands = 16, thresholdPermille = 500)
    val brute = Dedup.ngramJaccardPairsFullIndex(docs, $"doc_id", $"text",
      blocking = lit(1), n = 3, thresholdPermille = 500)
    assert(lsh.exceptAll(brute).isEmpty, "LSH emitted a non-pair at sf0.01")
    assert(brute.exceptAll(lsh).isEmpty, "LSH missed a true pair at sf0.01")
  }

  test("sf0.01: prefix-filtered ngram == full inverted index") {
    val pref = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text",
      blocking = $"source", n = 2, thresholdPermille = 200)
    val full = Dedup.ngramJaccardPairsFullIndex(docs, $"doc_id", $"text",
      blocking = $"source", n = 2, thresholdPermille = 200)
    assert(pref.exceptAll(full).isEmpty && full.exceptAll(pref).isEmpty)
  }

  test("sf0.01: banded embedding near-dup ⊆ exact all-pairs, non-empty") {
    val blocked = Dedup.embeddingNearDupPairs(embs, $"vec_id", $"embedding",
      thresholdNum = 2, thresholdDen = 5)
    val all = Dedup.embeddingNearDupPairsAllPairs(embs, $"vec_id",
      $"embedding", thresholdNum = 2, thresholdDen = 5)
    assert(blocked.exceptAll(all).isEmpty)
    assert(blocked.count() > 0)
  }
}
