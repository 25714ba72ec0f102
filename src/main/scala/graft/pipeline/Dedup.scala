package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup detection.
  *
  * Scale design (100 TB):
  *  - Exact dedup is a single hash shuffle on the fingerprint (Spark 4's
  *    WindowGroupLimit pushes the rank-1 filter below the exchange, so only
  *    one candidate row per (fingerprint, partition) shuffles).
  *  - Fuzzy variants never do an O(n²) cross join: candidates come from
  *    LSH band buckets (MinHash), 16-bit chunk buckets (SimHash — pigeonhole
  *    guarantees recall for hamming ≤ 3 over 4 chunks), or hyperplane-sign
  *    buckets (embeddings). The expensive exact verification (Jaccard /
  *    hamming / cosine) runs only on bucket-cohabiting pairs.
  *  - Skew: a pathological bucket (e.g. millions of identical docs) turns
  *    the bucket self-join quadratic. `maxBucket` caps membership per bucket
  *    (rows beyond the cap in one bucket are still caught by their other
  *    bands with high probability) — the standard salting-style guard.
  *
  * All candidate generation is pure `functions._` (codegen); signatures use
  * xxhash64, so fuzzy results are Spark-deterministic but have no SQL oracle
  * (the driver records a rows-only check for them).
  */
object Dedup {

  /** Exact dedup: keep the smallest-id row per normalized-text fingerprint.
    * One shuffle on the fingerprint; WindowGroupLimit bounds the sort. */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(text)).orderBy(id.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingle set (distinct xxhash64 values) of a text column. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(TextAnalysis.shingleHashes(text, n))

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum over the shingle set. Seeding = hashing the shingle value with
    * the function index. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingles, s => xxhash64(s, h))))

  /** Candidate duplicate pairs via MinHash + LSH banding, verified with the
    * exact Jaccard similarity of the shingle sets.
    *
    * Returns (id_a, id_b, jaccard_permille) with id_a < id_b and
    * jaccard >= `threshold` (0-1000 per-mille scale, floor — integer-exact).
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      thresholdPermille: Int = 700, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val docs = df.select(id.cast("long").as("id"),
        shingleSet(text, n).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sigs = docs.withColumn("sig",
      minhashSignature(col("shingles"), numHashes))
    // One row per (doc, band): bucket key = hash of the band's signature rows.
    val bucketed = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .toDF("id", "band", "bucket")
    val capped = capBuckets(bucketed, maxBucket)
    val pairs = candidatePairs(capped)
    verifyJaccard(pairs, docs, thresholdPermille)
  }

  /** Exact n-gram Jaccard pairs within a blocking key (e.g. same source) —
    * the no-sketch variant for when blocks are small enough to pair fully. */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      blocking: Column, n: Int = 3, thresholdPermille: Int = 500): DataFrame = {
    val docs = df.select(id.cast("long").as("id"), blocking.as("block"),
        shingleSet(text, n).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val a = docs.select(col("block"), col("id").as("id_a"),
      col("shingles").as("sh_a"))
    val b = docs.select(col("block"), col("id").as("id_b"),
      col("shingles").as("sh_b"))
    a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard_permille", jaccardPermille(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_permille") >= thresholdPermille)
      .select("id_a", "id_b", "jaccard_permille")
  }

  /** 64-bit SimHash of the word-token multiset: bit b is set iff the sum of
    * (+1 / -1) over tokens' hash bit b is positive. Single aggregation with
    * map-side combine (64 sum columns), no UDF. */
  def simhash64(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df.select(id.cast("long").as("id"),
      explode(TextAnalysis.tokens(text)).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val agg = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
    agg.select(col("id"), sim.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ `maxHamming` (≤ 3 for full
    * recall with 4 chunks, by pigeonhole). Buckets on each 16-bit chunk. */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val sims = simhash64(df, id, text)
    val chunks = (0 until 4).map(c => struct(lit(c).as("band"),
      shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(0xFFFFL)
        .as("bucket")))
    val bucketed = sims.select(col("id"), explode(array(chunks: _*)).as("bc"))
      .select(col("id"), col("bc.band").as("band"), col("bc.bucket").as("bucket"))
    val pairs = candidatePairs(capBuckets(bucketed, maxBucket))
    pairs
      .join(sims.select(col("id").as("id_a"), col("simhash").as("sh_a")), "id_a")
      .join(sims.select(col("id").as("id_b"), col("simhash").as("sh_b")), "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-dup pairs: multi-band hyperplane-sign LSH (deterministic
    * seeded planes), cosine-verified. Each of `bands` independent tables
    * buckets on `planesPerBand` sign bits; a pair is a candidate if it
    * co-buckets in ANY band — the standard AND-OR construction: recall
    * 1-(1-p^r)^L for per-plane agreement p. More bands → recall, more
    * planes/band → precision (smaller buckets) at scale. */
  def embeddingNearDupPairs(df: DataFrame, id: Column, vec: Column,
      dim: Int, bands: Int = 16, planesPerBand: Int = 2,
      thresholdMicro: Int = 400000,
      maxBucket: Int = 10000, seed: Long = 42L): DataFrame = {
    val hp = Similarity.hyperplanes(bands * planesPerBand, dim, seed)
    val docs = df.select(id.cast("long").as("id"), vec.as("v"))
    val bandCols = (0 until bands).map { b =>
      val sig = (0 until planesPerBand).map { i =>
        when(Similarity.dot(col("v"),
          typedLit(hp(b * planesPerBand + i))) >= 0,
          shiftleft(lit(1L), i)).otherwise(lit(0L))
      }.reduce((a, c) => a.bitwiseOR(c))
      struct(lit(b).as("band"), sig.as("bucket"))
    }
    val bucketed = docs
      .select(col("id"), explode(array(bandCols: _*)).as("bc"))
      .select(col("id"), col("bc.band").as("band"), col("bc.bucket").as("bucket"))
    val pairs = candidatePairs(capBuckets(bucketed, maxBucket))
    pairs
      .join(docs.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cosine_micro",
        floor(Similarity.cosine(col("v_a"), col("v_b")) * 1000000).cast("long"))
      .filter(col("cosine_micro") >= thresholdMicro)
      .select("id_a", "id_b", "cosine_micro")
  }

  /** Keep-min-id fuzzy dedup: from verified pairs, drop every doc that has a
    * duplicate partner with a smaller id. */
  def dropIdsFromPairs(pairs: DataFrame): DataFrame =
    pairs.select(col("id_b").as("drop_id")).distinct()

  // ---- shared internals ----

  /** Join candidate pairs back to shingle sets and keep those whose exact
    * Jaccard clears the threshold. */
  private def verifyJaccard(pairs: DataFrame, docs: DataFrame,
      thresholdPermille: Int): DataFrame =
    pairs
      .join(docs.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard_permille", jaccardPermille(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_permille") >= thresholdPermille)
      .select("id_a", "id_b", "jaccard_permille")

  /** Integer-exact Jaccard: |a ∩ b| * 1000 / |a ∪ b| (floor). */
  private[pipeline] def jaccardPermille(a: Column, b: Column): Column =
    floor(size(array_intersect(a, b)) * lit(1000) /
      greatest(size(array_union(a, b)), lit(1))).cast("long")

  /** Cap bucket membership: keep the `maxBucket` smallest ids per bucket
    * (deterministic; overflow rows rely on their other bands). */
  private def capBuckets(bucketed: DataFrame, maxBucket: Int): DataFrame = {
    val w = Window.partitionBy("band", "bucket").orderBy(col("id").asc)
    bucketed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBucket).drop("__rn")
  }

  /** Distinct co-bucketed id pairs (id_a < id_b). */
  private def candidatePairs(bucketed: DataFrame): DataFrame =
    bucketed.as("x")
      .join(bucketed.as("y"), Seq("band", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
}
