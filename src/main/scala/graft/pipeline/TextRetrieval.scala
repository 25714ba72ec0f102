package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** BM25-style full-text retrieval over an inverted index — the "find the
  * training docs about X" operator a 100 TB corpus pipeline needs, built
  * Spark-first: the index is ordinary partitioned parquet, the query is a
  * partition-pruned scan + one aggregation, and the scoring runs entirely
  * in whole-stage codegen.
  *
  * Index layout (`buildIndex`): one row per (term, doc) posting with tf,
  * doc length and document frequency DENORMALIZED into the row, written
  * partitioned by `tb = pmod(xxhash64(term), termBuckets)`. Denormalizing
  * dl/df costs two longs per posting but makes the query path JOIN-FREE:
  * scoring needs only the posting rows of the query's terms, so a search
  * reads `O(query terms / termBuckets)` of the index via partition pruning
  * (plan-asserted in RetrievalSpec), then one `groupBy(doc_id).sum` and a
  * top-k. Corpus-level stats (N docs, total length) live in a one-row
  * sidecar read on the driver.
  *
  * Skew: stop-word posting lists are the classic hot key. `maxDfPermille`
  * drops terms present in more than that fraction of documents from the
  * index at build time (standard IR practice — such terms carry ~zero idf
  * anyway), bounding the largest posting list. Default keeps everything so
  * the oracle sees the full corpus.
  *
  * Two scoring modes:
  *  - [[bm25TopK]]: textbook BM25 (Robertson/Sparck Jones; k1=1.2, b=0.75,
  *    log idf) in doubles — the production scorer. Spec-gated against an
  *    independently-composed plan (fp sums are order-dependent, so this is
  *    tolerance-checked, not hash-exact).
  *  - [[exactTopK]]: the same tf-saturation/length-normalization shape in
  *    SCALED-INTEGER arithmetic with a rational idf — every division an
  *    integer floor-div, every sum a long sum, so the score is bit-exact
  *    across engines and the DuckDB oracle reproduces it literally
  *    (`q_bm25_topk`; the r10 `q_v2_sum` lesson applied from day one:
  *    never put fp folds under a hash-exactness gate).
  *
  * Scale note: the rational idf `(S·(N+1)) div (df+1)` overflows long at
  * N ≈ 9·10^12 docs with S = 10^6 — document-count, not byte, scale; the
  * production fp scorer has no such bound.
  */
object TextRetrieval {

  /** Fixed-point scale for the exact scorer. */
  val Scale = 1000000L
  private val K1S = 1200000L // k1 = 1.2, scaled
  private val BS = 750000L   // b  = 0.75, scaled

  /** Tokenization shared with the rest of the text surface
    * ([[TextAnalysis.tokens]]): whitespace split of trim(lower(text)). */
  private def toks(text: Column): Column = TextAnalysis.tokens(text)

  /** One row per (term, doc) with everything scoring needs:
    * `(term, doc_id, tf, dl, df)`. */
  def postings(docs: DataFrame, idCol: Column, textCol: Column,
      maxDfPermille: Int = 1000): DataFrame = {
    val tok = docs.select(idCol.cast("long").as("doc_id"),
      explode(toks(textCol)).as("term"))
    val post = tok.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dfreq = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(idCol).distinct().count()
    val capped =
      if (maxDfPermille >= 1000) dfreq
      else dfreq.where(col("df") * 1000L <= lit(n * maxDfPermille.toLong))
    post.join(dl, "doc_id").join(capped, "term")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
  }

  /** Build the serving index under `dir`: `dir/postings` partitioned by
    * term bucket, `dir/stats` a one-row corpus sidecar `(n, sdl)`. */
  def buildIndex(spark: SparkSession, docs: DataFrame, idCol: Column,
      textCol: Column, dir: String, termBuckets: Int = 16,
      maxDfPermille: Int = 1000): Unit = {
    val post = postings(docs, idCol, textCol, maxDfPermille)
      .withColumn("tb", pmod(xxhash64(col("term")), lit(termBuckets)))
    post.repartition(termBuckets, col("tb"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$dir/postings")
    // Corpus stats over ALL docs (independent of any df cap): N and Σdl.
    val tok = docs.select(idCol.cast("long").as("doc_id"),
      explode(toks(textCol)).as("term"))
    tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** The driver-side term bucket — same Catalyst hash as the written
    * `tb` column (`pmod(xxhash64(term), buckets)`). */
  private[graft] def termBucket(term: String, buckets: Int): Int =
    graft.read.GraftFileIndex.keyBucket(UTF8String.fromString(term), buckets)

  /** Posting rows of the query terms only: partition-pruned by term
    * bucket, then term-filtered (pushed to parquet). */
  private def queryPostings(spark: SparkSession, dir: String,
      terms: Seq[String], termBuckets: Int): DataFrame = {
    val buckets = terms.map(termBucket(_, termBuckets)).distinct
    spark.read.parquet(s"$dir/postings")
      .where(col("tb").isin(buckets.map(Integer.valueOf): _*))
      .where(col("term").isin(terms: _*))
  }

  private case class CorpusStats(n: Long, sdl: Long)

  private def stats(spark: SparkSession, dir: String): CorpusStats = {
    val r = spark.read.parquet(s"$dir/stats").head()
    CorpusStats(r.getLong(0), r.getLong(1))
  }

  /** Production scorer: BM25 with log idf in doubles, top-k docs for one
    * term list. Returns `(doc_id, score)`, score descending / doc_id
    * ascending. */
  def bm25TopK(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int, termBuckets: Int = 16): DataFrame = {
    val st = stats(spark, dir)
    val avgdl = st.sdl.toDouble / math.max(st.n, 1L).toDouble
    val scored = queryPostings(spark, dir, terms, termBuckets)
      .withColumn("idf",
        log(lit(1.0) + (lit(st.n.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("tscore",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
    scored.groupBy(col("doc_id"))
      .agg(sum(col("tscore")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Oracle-exact scorer: scaled-integer BM25 shape with rational idf.
    * Every operation below is a long add/multiply or a floor division of
    * nonnegative longs — DuckDB's `//` computes the identical value, so
    * the score column is engine-portable bit-for-bit. Returns
    * `(doc_id, score)` top-k, score desc / doc_id asc. */
  def exactTopK(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int, termBuckets: Int = 16): DataFrame = {
    val st = stats(spark, dir)
    val avgdlS = Scale * st.sdl / math.max(st.n, 1L) // scaled avg doc len
    val scored = queryPostings(spark, dir, terms, termBuckets)
      .withColumn("idf_s",
        expr(s"(${Scale} * (${st.n} + 1)) div (df + 1)"))
      .withColumn("norm_s",
        expr(s"${Scale} - ${BS} + (${BS} * dl * ${Scale}) div ${avgdlS}"))
      .withColumn("tfq_s",
        expr(s"(tf * ${K1S + Scale} * ${Scale}) div " +
          s"(tf * ${Scale} + (${K1S} * norm_s) div ${Scale})"))
      .withColumn("tscore", expr(s"(idf_s * tfq_s) div ${Scale}"))
    scored.groupBy(col("doc_id"))
      .agg(sum(col("tscore")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Batch form: many queries at once. `queries` is `(qid, term)` rows
    * (one per query term); the query side is broadcast into the pruned
    * posting scan, so the cost stays O(postings of the union of terms).
    * Returns `(qid, doc_id, score)` with per-query rank ≤ k (exact
    * scorer). */
  def exactTopKBatch(spark: SparkSession, dir: String,
      queries: DataFrame, k: Int, termBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = stats(spark, dir)
    val avgdlS = Scale * st.sdl / math.max(st.n, 1L)
    val terms = queries.select(col("term").cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq // query-sized
    val q = broadcast(queries.select(col("qid"), col("term").as("qterm")))
    val scored = queryPostings(spark, dir, terms, termBuckets)
      .join(q, col("term") === col("qterm"))
      .withColumn("idf_s",
        expr(s"(${Scale} * (${st.n} + 1)) div (df + 1)"))
      .withColumn("norm_s",
        expr(s"${Scale} - ${BS} + (${BS} * dl * ${Scale}) div ${avgdlS}"))
      .withColumn("tfq_s",
        expr(s"(tf * ${K1S + Scale} * ${Scale}) div " +
          s"(tf * ${Scale} + (${K1S} * norm_s) div ${Scale})"))
      .withColumn("tscore", expr(s"(idf_s * tfq_s) div ${Scale}"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("tscore")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k).drop("rnk")
      .orderBy(col("qid"), col("score").desc, col("doc_id").asc)
  }
}
