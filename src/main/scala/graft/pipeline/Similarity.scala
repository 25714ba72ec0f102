package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — queries are broadcast (they're the
  * small side by construction), scores are computed in one codegen'd pass
  * over the corpus with higher-order functions (`zip_with` + `aggregate`,
  * no UDF), and the per-query top-k uses a rank window that Spark 4 rewrites
  * with WindowGroupLimit: each input partition pre-selects its local top-k
  * before the shuffle, so the exchange moves O(#queries × k × #partitions)
  * rows, not the full score matrix.
  *
  * Scale path: hyperplane-sign LSH buckets (deterministic seeded planes
  * shared with [[Dedup.embeddingNearDupPairs]]) — at 100 TB the corpus is
  * bucketed once (writable as a bucketed table) and each query probes only
  * its own bucket; recall is tuned by `planes` (fewer planes → bigger
  * buckets → higher recall, more compute).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm (double). */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  /** Cosine similarity in [-1, 1] (double); 0 when either vector is zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0d, lit(0.0d)).otherwise(dot(a, b) / d)
  }

  /** Exact brute-force top-k: for every query row, the `k` corpus rows with
    * the highest cosine similarity (ties broken by corpus id asc).
    * Output: (query_id, corpus_id, rank, cosine_micro). */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int): DataFrame = {
    val c = graft.util.ParallelScan.widen(
      corpus.select(corpusId.cast("long").as("corpus_id"),
        corpusVec.as("cv")))
    val q = queries.select(queryId.cast("long").as("query_id"),
      queryVec.as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cosine_micro", floor(col("cos") * 1000000).cast("long"))
      .select("query_id", "corpus_id", "rank", "cosine_micro")
  }

  /** Approximate top-k via hyperplane-sign LSH: queries probe only corpus
    * rows sharing their sign-bucket. Same output shape as brute force;
    * recall < 1 by design (documented trade: `planes` ↓ → recall ↑). */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, dim: Int, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val hp = hyperplanes(planes, dim, seed)
    def sig(v: Column): Column = hp.zipWithIndex.map { case (h, i) =>
      when(dot(v, typedLit(h)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val c = graft.util.ParallelScan.widen(
      corpus.select(corpusId.cast("long").as("corpus_id"),
        corpusVec.as("cv"))).withColumn("bucket", sig(col("cv")))
    val q = queries.select(queryId.cast("long").as("query_id"),
      queryVec.as("qv")).withColumn("bucket", sig(col("qv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cosine_micro", floor(col("cos") * 1000000).cast("long"))
      .select("query_id", "corpus_id", "rank", "cosine_micro")
  }

  /** Deterministic pseudo-random unit-free hyperplanes (seeded; identical
    * across the driver fleet — no RNG at execution time). */
  private[pipeline] def hyperplanes(planes: Int, dim: Int,
      seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
