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

  /** Cosine similarity in [-1, 1] (double); 0 when either vector is zero.
    * ONE fused codegen'd pass over the pair
    * ([[graft.functions.FloatCosine]]) — the scoring inner loop of every
    * top-k path; bit-identical to [[cosineViaHof]] (property-pinned). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.FloatCosine.cosine(a, b)

  /** The pre-r6 declarative cosine — three HOF traversals with two
    * intermediate arrays per row. Kept ONLY as the independent reference
    * formulation the native kernel's equality property pins against. */
  private[graft] def cosineViaHof(a: Column, b: Column): Column = {
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

  // ---- IVF (inverted-file) ANN: the coarse-quantizer scale path ----

  /** Train `nlist` IVF centroids with `iters` Lloyd steps, fully as
    * DataFrame aggregations (no MLlib, no driver-side data beyond the
    * centroids themselves — O(nlist·dim), metadata-sized).
    *
    * Initialization is deterministic: the `nlist` corpus rows with the
    * smallest xxhash64(id) (a seeded uniform sample that is reproducible
    * across cluster layouts, unlike `rdd.takeSample`).
    *
    * Scale: each Lloyd step is one broadcast-join (assignment against the
    * broadcast centroid table) + one map-side-combined average — the
    * standard distributed k-means shape; cost is O(n·nlist·dim) per iter. */
  def ivfTrain(corpus: DataFrame, id: Column, vec: Column,
      nlist: Int, iters: Int = 2, seed: Long = 42L,
      trainFraction: Double = 1.0): Seq[(Int, Seq[Float])] =
    ivfTrainOcc(corpus, id, vec, nlist, iters, seed, trainFraction,
      withOccupancy = false)._1

  /** [[ivfTrain]] plus — `withOccupancy = true` — the per-cell
    * OCCUPANCY ESTIMATE of the final centroids over the (persisted)
    * train sample, scaled by 1/trainFraction: one extra CACHE-READ
    * assignment pass, never an extra corpus scan. Feeds the kNN joins'
    * occupancy-derived cell splits ([[cellSplitsOf]]) — load balancing
    * only, so the sampled estimate is safe; trainFraction = 1.0 makes
    * it exact. */
  private[graft] def ivfTrainOcc(corpus: DataFrame, id: Column,
      vec: Column, nlist: Int, iters: Int = 2, seed: Long = 42L,
      trainFraction: Double = 1.0, withOccupancy: Boolean = true)
      : (Seq[(Int, Seq[Float])], Map[Int, Long]) = {
    // persisted across the init pick + every Lloyd step (r10): uncached,
    // each phase re-scans and re-samples the source — iters+1 corpus
    // passes for a training set trainFraction sizes to fit the executors
    val c = trainSample(graft.util.ParallelScan.widen(
      corpus.select(id.cast("long").as("id"), vec.as("v"))),
      trainFraction, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Seq[(Int, Seq[Float])] =
        c.withColumn("__h", xxhash64(col("id"), lit(seed)))
          .orderBy(col("__h")).limit(nlist)
          .select(col("v")).collect()
          .map(_.getSeq[Float](0).toSeq).zipWithIndex
          .map { case (v, i) => (i, v) }.toSeq
      for (_ <- 0 until iters) {
        val assigned = assignToCentroid(c, centroids)
        val updated = clusterMeans(assigned, centroids.head._2.size)
        centroids = centroids.map { case (cl, v) =>
          cl -> updated.getOrElse(cl, v)
        }
      }
      val occ =
        if (!withOccupancy) Map.empty[Int, Long]
        else assignToCentroid(c, centroids)
          .groupBy("__cluster").agg(count(lit(1)).as("__c"))
          .collect()
          .map(r => r.getInt(0) ->
            math.ceil(r.getLong(1) / trainFraction).toLong)
          .toMap
      (centroids, occ)
    } finally c.unpersist()
  }

  /** Lloyd-step per-cluster means via the native
    * [[graft.functions.VectorMeanAgg]]: ONE aggregate per cluster with a
    * primitive `double[dim+1]` buffer (map-side combined), the shuffle
    * carries nlist rows, and the driver collect is O(nlist·dim) PRIMITIVE
    * doubles — vs the posexplode form's O(nlist·dim)-row shuffle and boxed
    * `Map[Int, Double]` payload (~GBs at nlist 10⁵ × dim 1024). Equality
    * with [[meansViaExplodeForm]] is property-pinned in PipelineSpec. */
  private[graft] def clusterMeans(assigned: DataFrame,
      dim: Int): Map[Int, Seq[Float]] =
    // null vectors are dropped BEFORE grouping so a cluster whose rows are
    // all null is absent from the result (the caller then keeps its old
    // centroid) — identical to what posexplode of a null array yields.
    assigned.filter(col("v").isNotNull).groupBy("__cluster")
      .agg(graft.functions.VectorMeanAgg.vectorMean(col("v"), dim).as("m"))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getSeq[Double](1).map(_.toFloat): Seq[Float]))
      .toMap

  /** The pre-r6 declarative Lloyd step — posexplode + (cluster, pos) avg +
    * map_from_arrays collect. Kept ONLY as the independent reference
    * formulation the [[clusterMeans]] equality property pins against. */
  private[graft] def meansViaExplodeForm(assigned: DataFrame,
      dim: Int): Map[Int, Seq[Float]] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned
      .select(col("__cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("__cluster", "pos").agg(avg(col("x")).as("m"))
      .groupBy("__cluster")
      .agg(map_from_arrays(collect_list(col("pos")),
        collect_list(col("m"))).as("mm"))
      .as[(Int, Map[Int, Double])].collect()
      .map { case (cl, mm) =>
        cl -> ((0 until dim).map(p => mm.getOrElse(p, 0.0).toFloat): Seq[Float])
      }.toMap
  }

  /** Centroid matrix in row-index-=-cluster-id order for the native
    * [[graft.functions.NearestCentroids]] kernel. Training produces
    * contiguous ids 0..nlist−1 ([[ivfTrain]]); enforced so the kernel's
    * row indices ARE the cluster ids. */
  private def centroidMatrix(
      centroids: Seq[(Int, Seq[Float])]): Seq[Seq[Double]] = {
    val sorted = centroids.sortBy(_._1)
    require(sorted.zipWithIndex.forall { case ((cl, _), i) => cl == i },
      "centroid ids must be contiguous 0..nlist-1")
    sorted.map(_._2.map(_.toDouble))
  }

  /** Nearest-centroid assignment (dot-product metric, deterministic
    * lowest-index tiebreak) against the centroid matrix, via ONE native
    * expression node ([[graft.functions.NearestCentroids]]): the plan stays
    * constant-size in nlist (a 10⁵-centroid matrix is one reference object
    * shipped with the stage, not 10⁵ analyzed HOF columns), and the scoring
    * loop runs inside whole-stage codegen. Score arithmetic and tiebreak
    * are bit-identical to the declarative [[assignViaExprForm]] it replaced
    * (property-pinned in PipelineSpec). */
  private[graft] def assignToCentroid(c: DataFrame,
      centroids: Seq[(Int, Seq[Float])]): DataFrame =
    c.withColumn("__cluster", element_at(
      graft.functions.NearestCentroids.nearest(
        col("v"), centroidMatrix(centroids), 1), 1))

  /** The pre-r5 declarative assignment — `greatest` over one
    * `struct(dot, −cl)` column per centroid (the struct carries the NEGATED
    * id so `greatest`, which prefers the larger second field on score ties,
    * resolves to the lowest cluster index). O(nlist)-wide in the plan: kept
    * ONLY as the independent reference formulation the equality property
    * pins the native kernel against. */
  private[graft] def assignViaExprForm(c: DataFrame,
      centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    val scores = centroids.map { case (cl, cv) =>
      struct(dot(col("v"), typedLit(cv.map(_.toDouble))).as("s"),
        lit(-cl).as("ncl"))
    }
    c.withColumn("__cluster",
      -greatest(scores: _*).getField("ncl"))
  }

  /** Materialize the corpus as an IVF-partitioned table: one partition
    * directory per centroid cell. This is the ANN SERVING layout at 100 TB —
    * probes then read only their `nprobe` cells via directory-level
    * partition pruning ([[ivfTopKFromTable]]), so query cost is
    * O(nprobe·cell), not a corpus scan. Returns the (deterministic)
    * centroids; persist them app-side or re-derive with the same seed. */
  def ivfWrite(corpus: DataFrame, id: Column, vec: Column, path: String,
      nlist: Int, iters: Int = 2, seed: Long = 42L,
      trainFraction: Double = 1.0): Seq[(Int, Seq[Float])] = {
    val centroids = ivfTrain(corpus, id, vec, nlist, iters, seed,
      trainFraction)
    assignToCentroid(
        corpus.select(id.cast("long").as("corpus_id"), vec.as("v")), centroids)
      .withColumnRenamed("v", "cv")
      .write.mode("overwrite").partitionBy("__cluster").parquet(path)
    centroids
  }

  /** INCREMENTAL ingest into an [[ivfWrite]] table: assign a batch of NEW
    * vectors to the FROZEN centroids and append them to their cells'
    * partitions — the standard IVF growth path (FAISS `add` semantics):
    * no retrain, no rewrite of existing cells, the query path unchanged
    * (listing picks up the appended files; a previously-EMPTY cell gains
    * its directory on first arrival and probes start finding it).
    *
    * Exactness: with nprobe = nlist the index stays exactly brute force
    * over the UNION of all ingested batches — assignment only places
    * vectors, never loses them (oracle-gated `q_ivf_ingest_topk`). At
    * realistic nprobe, recall drifts as the data distribution moves away
    * from the frozen centroids; re-training cadence is an operational
    * choice (rebuild via [[ivfWrite]]), exactly the FAISS trade. */
  def ivfIngest(batch: DataFrame, id: Column, vec: Column, path: String,
      centroids: Seq[(Int, Seq[Float])]): Unit =
    assignToCentroid(
        batch.select(id.cast("long").as("corpus_id"), vec.as("v")),
        centroids)
      .withColumnRenamed("v", "cv")
      .write.mode("append").partitionBy("__cluster").parquet(path)

  /** Approximate top-k against an [[ivfWrite]] table: the probe cells of
    * the query batch are resolved DRIVER-side from the centroid list
    * (metadata-sized), so the scan carries a static `__cluster IN (...)`
    * partition filter — untouched cells never enter the plan (asserted via
    * inputFiles in PipelineSpec). Same output shape as [[bruteForceTopK]]. */
  def ivfTopKFromTable(spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Seq[(Int, Seq[Float])],
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, nprobe: Int = 2): DataFrame = {
    val qd = queries.select(queryId.cast("long").as("query_id"),
        queryVec.as("qv"))
      .withColumn("__cluster", explode(probeClusters(centroids, nprobe)(col("qv"))))
    // Distinct probe cells of this query batch — driver-side, O(|q|·nprobe).
    // The scan lists ONLY those cells' directories (structural pruning:
    // untouched cells never reach the FileIndex, let alone the plan);
    // basePath keeps __cluster as a column for the probe join. Cells that
    // got no corpus vectors (k-means can leave a centroid empty) have no
    // directory — skipping them is exact, there is nothing to score there.
    val tableDir = new org.apache.hadoop.fs.Path(path)
    val existing = tableDir.getFileSystem(
        spark.sessionState.newHadoopConf())
      .listStatus(tableDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("__cluster=") =>
        n.stripPrefix("__cluster=").toInt
      }.toSet
    val cells = qd.select("__cluster").distinct()
      .collect().map(_.getInt(0)).toSeq.filter(existing)
    if (cells.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("corpus_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("cosine_micro",
            org.apache.spark.sql.types.LongType))))
    val corpus = spark.read.option("basePath", path)
      .parquet(cells.map(c => s"$path/__cluster=$c"): _*)
    val scored = corpus.join(broadcast(qd), Seq("__cluster"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cosine_micro", floor(col("cos") * 1000000).cast("long"))
      .select("query_id", "corpus_id", "rank", "cosine_micro")
  }

  /** The `nprobe` nearest centroid ids of a vector, score-desc with
    * ascending-id tiebreak (shared by [[ivfTopK]] and [[ivfTopKFromTable]]).
    * Same native single-node kernel as [[assignToCentroid]] — constant-size
    * plan in nlist, vs. the O(nlist)-wide `array_sort`-of-structs reference
    * form [[probeViaExprForm]]. */
  private[graft] def probeClusters(centroids: Seq[(Int, Seq[Float])],
      nprobe: Int)(q: Column): Column =
    graft.functions.NearestCentroids.nearest(
      q, centroidMatrix(centroids), nprobe)

  /** The pre-r5 declarative probe — `array_sort` over one scored struct per
    * centroid. Kept ONLY as the independent reference formulation for the
    * kernel-equality property in PipelineSpec. */
  private[graft] def probeViaExprForm(centroids: Seq[(Int, Seq[Float])],
      nprobe: Int)(q: Column): Column = {
    val scored = centroids.map { case (cl, cv) =>
      struct(dot(q, typedLit(cv.map(_.toDouble))).as("s"), lit(cl).as("cl"))
    }
    slice(transform(
      array_sort(array(scored: _*),
        (a, b) => when(a.getField("s") > b.getField("s"), -1)
          .when(a.getField("s") < b.getField("s"), 1)
          .otherwise(a.getField("cl") - b.getField("cl"))),
      x => x.getField("cl")), 1, nprobe)
  }

  /** IVF approximate top-k: corpus rows are bucketed by nearest centroid
    * (in production: written once as a `partitionBy` table — see
    * [[ivfWrite]]/[[ivfTopKFromTable]] for that path); each query probes
    * only its `nprobe` nearest centroid buckets. Same output shape as
    * [[bruteForceTopK]]; recall < 1 by design, tuned by `nprobe`/`nlist`. */
  // ---- PQ (product quantization): compressed-domain ANN scoring ----
  //
  // The vector-compression path (VERDICT r7 next-round #6): split each
  // dim-vector into `m` subvectors of dim/m, k-means a ksub-entry codebook
  // per subspace (L2 metric — the PQ standard), and store each corpus
  // vector as m SMALL CODES (+ its true norm, for cosine). Scoring is ADC
  // (asymmetric distance computation): per query, one m×ksub lookup table
  // of <query-subvector, codebook-entry> dots; a corpus row's approximate
  // dot is the sum of m LUT lookups — O(m) per pair instead of O(dim), and
  // the corpus scan reads m bytes + 8 (norm) instead of 4·dim. At dim 1024
  // / m 16 that is a 250× read-and-compute compression, which is what makes
  // exhaustive re-scoring of a 100 TB corpus feasible; compose with IVF
  // (encode each cell's vectors) for the classic IVF-PQ serving layout.
  //
  // Everything is declarative: codebooks are plan literals (metadata-sized,
  // like the IVF centroid matrix), assignment reuses the native
  // [[graft.functions.NearestCentroids]] kernel via the augmented-
  // dimension trick (argmin ‖x−c‖² == argmax ⟨[x,1],[c,−‖c‖²/2]⟩ — the
  // dot-metric kernel does L2 without a new expression), and ADC is
  // codegen'd `zip_with`/`aggregate` HOFs. No UDFs, no RDDs.
  //
  // Honest gate strategy (ROUND7_NOTES): ADC is approximate BY
  // CONSTRUCTION, so correctness is (a) a PipelineSpec property pinning
  // the ADC score ≡ the dot product against the RECONSTRUCTED vector
  // (mathematically equal; fp-summation-order tolerance 1e-9), (b) the
  // exact-path oracle q_pq_topk: with `rerank` ≥ corpus size the ADC stage
  // only generates candidates and the exact-cosine rerank makes the result
  // ≡ bruteForceTopK (hash-gated vs DuckDB, like q_ivf_topk's
  // nprobe=nlist), and (c) recall@k of the REALISTIC modes (pure ADC, and
  // small-multiple rerank) measured in RECALL_r8.json.

  /** Per-subspace codebooks: `books(s)(code)` is subspace `s`'s centroid
    * for code value `code` (0-based, matching the assignment kernel). */
  type PqCodebooks = Seq[Seq[Seq[Float]]]

  private def subCol(vec: Column, s: Int, dsub: Int): Column =
    slice(vec, s * dsub + 1, dsub)

  /** Deterministic hash-sample of a (id, v) training frame: keep rows
    * whose seeded xxhash64(id) falls under the fraction threshold.
    * Reproducible across cluster layouts and re-runs (unlike
    * `df.sample`'s partition-order-dependent RNG); `fraction >= 1` is
    * the identity. Training-ONLY — encode/serve paths never sample. */
  private def trainSample(c: DataFrame, fraction: Double,
      seed: Long): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"trainFraction must be in (0, 1], got $fraction")
    if (fraction >= 1.0) c
    else c.filter(
      pmod(xxhash64(col("id"), lit(seed + 0x54a17L): Column), lit(1000000L)) <
        lit(math.max(1L, (fraction * 1000000L).toLong)))
  }

  /** L2-nearest codebook entries via the dot-metric kernel on augmented
    * vectors: append 1 to the vector and −‖c‖²/2 to each centroid —
    * ⟨[x,1],[c,−‖c‖²/2]⟩ = ⟨x,c⟩ − ‖c‖²/2, whose argmax is the L2 argmin
    * (‖x‖² is constant per row). Tiebreak: lowest code, deterministic. */
  private def nearestL2(sub: Column, cents: Seq[Seq[Float]],
      n: Int): Column =
    graft.functions.NearestCentroids.nearest(
      concat(sub, array(lit(1.0f))),
      cents.map(c => c.map(_.toDouble) :+
        (-c.map(x => x.toDouble * x).sum / 2.0)),
      n)

  /** Train the `m` per-subspace codebooks (ksub entries each, `iters`
    * Lloyd steps, L2 metric) — ALL subspaces in ONE distributed pass per
    * phase, not a per-subspace job loop: the corpus explodes once into
    * (id, subspace, subvector) rows, initialization is one windowed
    * smallest-hash pick per subspace, and each Lloyd step is ONE
    * assignment-fold (nearest entry via the per-subspace codebook carried
    * as a plan literal) feeding ONE map-side-combined
    * [[graft.functions.VectorMeanAgg]] grouped by (subspace, code). The
    * driver holds only the codebooks — O(m·ksub·dsub) floats — and the
    * job count is O(iters), independent of m (the r8 per-subspace loop
    * was O(m·iters) scheduler round trips).
    *
    * `trainFraction` < 1 trains on a DETERMINISTIC hash-sample of the
    * corpus (seeded xxhash64 threshold — reproducible across cluster
    * layouts, unlike `df.sample`): at 100 TB codebook quality needs
    * thousands of points per entry, not the corpus, so sampling cuts
    * training IO by 1/fraction while every EXACTNESS gate still holds
    * (encode/ADC/rerank never sample — only the Lloyd input does;
    * sampled-trained full-rerank ≡ brute force is pinned in
    * PipelineSpec, the recall delta measured in RECALL_r9). */
  def pqTrain(corpus: DataFrame, id: Column, vec: Column, dim: Int,
      m: Int, ksub: Int = 16, iters: Int = 2,
      seed: Long = 42L, trainFraction: Double = 1.0,
      init: Option[PqCodebooks] = None): PqCodebooks = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val dsub = dim / m
    val c = trainSample(graft.util.ParallelScan.widen(
      corpus.select(id.cast("long").as("id"), vec.as("v"))),
      trainFraction, seed)
    // one row per (id, subspace): the exploded training frame every phase
    // below reuses — m× the sample rows, each 1/m the width (same bytes).
    // PERSISTED across the init pick + Lloyd iterations (r10): without it
    // every phase re-scans and re-samples the source — at 100 TB that is
    // iters+1 corpus passes for a training set that fits the executors
    // (trainFraction is the sizing knob); MEMORY_AND_DISK spills rather
    // than recomputes if it doesn't.
    val sub0 = c.select(col("id"), explode(array((0 until m).map(s =>
      struct(lit(s).as("s"), subCol(col("v"), s, dsub).as("sv"))): _*))
      .as("e"))
      .select(col("id"), col("e.s").as("s"), col("e.sv").as("sv"))
    // persist only when the frame is actually READ more than once (cold
    // init + iters Lloyd passes); a warm-started single refinement (the
    // OPQ alternation tail) reads it exactly once — caching it would pay
    // a materialization pass for nothing (r11)
    val passes = (if (init.isEmpty) 1 else 0) + iters
    val sub = if (passes > 1)
      sub0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sub0
    try pqTrainOn(sub, m, dsub, ksub, iters, seed, init)
    finally if (passes > 1) { sub.unpersist(): Unit }
  }

  /** [[pqTrain]]'s Lloyd body over the persisted exploded frame. */
  private def pqTrainOn(sub: DataFrame, m: Int, dsub: Int, ksub: Int,
      iters: Int, seed: Long, init: Option[PqCodebooks]): PqCodebooks = {
    // WARM START (r10): a caller mid-alternation (OPQ) hands the previous
    // round's codebooks — Lloyd refines them instead of re-seeding and
    // re-converging from scratch. Cold start: deterministic seeded init,
    // one subspace-distinct hash stream each, picked with ONE bounded
    // smallest-hash aggregate over all subspaces (r17: the rank-window
    // form had exactly m rank partitions, funnelling the whole exploded
    // sample through m reducers plus a sort just to keep ksub rows each;
    // MinKVecAgg map-side-combines to ≤ ksub rows per mapper per
    // subspace — same (hash ASC, id ASC) total order, bit-identical pick,
    // pinned against the window form in PipelineSpec).
    init.foreach(b => require(b.size == m && b.forall(_.size == ksub),
      s"init codebooks shape ${b.map(_.size)} != ($m x $ksub)"))
    var books: Seq[Seq[Seq[Float]]] = init.getOrElse {
      // Null-id guard (r18, advisory): xxhash64 stays non-null for a null
      // id child, so the OLD window form could rank a null-id row while
      // the aggregate skips it. Ids are never null by the callers'
      // contract; the explicit filter makes the skip semantics identical
      // either way instead of leaving the divergence latent.
      val picked = sub
        .filter(col("id").isNotNull)
        .withColumn("__h", xxhash64(col("id"), col("s") + lit(seed)))
        .groupBy(col("s"))
        .agg(graft.functions.MinKVecAgg.minKVecs(
          col("__h"), col("id"), col("sv"), ksub).as("pk"))
        .select("s", "pk").collect()
        .map(r => r.getInt(0) ->
          r.getSeq[scala.collection.Seq[Float]](1).map(v =>
            (if (v == null) null else v.toSeq): Seq[Float]))
        .toMap
      (0 until m).map(s => picked.getOrElse(s, Seq.empty).toSeq)
    }
    for (_ <- 0 until iters) {
      // nearest codebook entry per (row, subspace): the m codebooks ride
      // the plan as literals; the CASE chain evaluates ONLY the row's own
      // subspace kernel (an array-of-all-m would run every kernel per row)
      val assigned = sub.withColumn("__cluster",
        (0 until m).map(s =>
            (s, element_at(nearestL2(col("sv"), books(s), 1), 1)))
          .foldLeft(lit(-1)) { case (acc, (s, e)) =>
            when(col("s") === s, e).otherwise(acc)
          })
      // one shuffle: (subspace, code) → mean subvector
      val updated = assigned.filter(col("sv").isNotNull)
        .groupBy("s", "__cluster")
        .agg(graft.functions.VectorMeanAgg.vectorMean(col("sv"), dsub)
          .as("mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getSeq[Double](2).map(_.toFloat): Seq[Float]))
        .toMap
      books = books.zipWithIndex.map { case (cents, s) =>
        cents.zipWithIndex.map { case (v, code) =>
          updated.getOrElse((s, code), v) // empty cell keeps its centroid
        }
      }
    }
    books
  }

  /** Encode the corpus against trained codebooks:
    * (corpus_id, codes array<int> of length m, vnorm, cv). `vnorm` is the
    * TRUE vector norm, stored so cosine ranking survives compression
    * (ADC approximates the dot; the norms are exact). `cv` is kept for
    * optional exact reranking — a production layout stores (id, codes,
    * vnorm) as the slim serving index and joins the top candidates back
    * to the full vectors by id. */
  def pqEncode(corpus: DataFrame, id: Column, vec: Column,
      books: PqCodebooks, dim: Int): DataFrame = {
    val m = books.size
    val dsub = dim / m
    corpus.select(id.cast("long").as("corpus_id"), vec.as("cv"))
      .withColumn("codes", array((0 until m).map(s =>
        element_at(nearestL2(subCol(col("cv"), s, dsub), books(s), 1), 1)): _*))
      .withColumn("vnorm", norm(col("cv")))
  }

  /** Per-query ADC lookup table: `lut(s)(code)` = ⟨q_s, books(s)(code)⟩.
    * The codebooks are plan LITERALS (array<array<double>> per subspace —
    * m·ksub·dsub doubles, metadata-sized); the table itself is computed
    * once per query row by codegen'd HOFs. */
  private[graft] def pqLut(qv: Column, books: PqCodebooks,
      dim: Int): Column =
    // native single-node kernel (r17, [[graft.functions.PqLutExpr]]):
    // the m·ksub·dsub codebook table ships as ONE stage reference
    // object instead of an analyzed array literal per query plan, and
    // the table builds in a primitive loop inside codegen instead of
    // m·ksub interpreted aggregate-HOF evaluations — bit-identical to
    // [[pqLutViaExprForm]] (property-pinned)
    graft.functions.AdcOps.pqLut(qv, books)

  /** The pre-r17 declarative LUT — kept ONLY as the reference
    * formulation for the PipelineSpec equality pin of
    * [[graft.functions.PqLutExpr]]. */
  private[graft] def pqLutViaExprForm(qv: Column, books: PqCodebooks,
      dim: Int): Column = {
    val m = books.size
    val dsub = dim / m
    array(books.zipWithIndex.map { case (cents, s) =>
      transform(typedLit(cents.map(_.map(_.toDouble))),
        cvec => aggregate(
          zip_with(subCol(qv, s, dsub), cvec, (x, y) => x * y),
          lit(0.0d), (acc, x) => acc + x))
    }: _*)
  }

  /** ADC approximate dot product: Σ_s lut(s)(codes(s)) — EXACTLY the dot
    * of the query with the reconstructed (decoded) vector, up to fp
    * summation order (property-pinned in PipelineSpec). Native kernel
    * (r17, [[graft.functions.AdcDotExpr]]): the HOF form evaluated
    * interpreted with per-row array allocations on the phase-1 ADC
    * scan — the [[graft.functions.SdcDot]] pathology on the
    * (probed-cell rows × queries) side. */
  private[graft] def adcDot(codes: Column, lut: Column): Column =
    graft.functions.AdcOps.adcDot(codes, lut)

  /** The pre-r17 declarative gather — kept ONLY as the reference
    * formulation for the PipelineSpec equality pin of
    * [[graft.functions.AdcDotExpr]]. */
  private[graft] def adcDotViaExprForm(codes: Column, lut: Column): Column =
    aggregate(zip_with(codes, lut,
      (code, tbl) => element_at(tbl, code + 1)),
      lit(0.0d), (acc, x) => acc + x)

  /** PQ top-k: score EVERY corpus row per query in the compressed domain
    * (O(m) per pair), then optionally rerank the ADC top-`rerank`
    * candidates by exact cosine. `rerank = 0` ranks purely by ADC cosine
    * (compressed reads only); `rerank ≥ corpus size` makes the result
    * exactly [[bruteForceTopK]] (the q_pq_topk oracle gate); realistic
    * serving uses a small multiple of k (recall measured in RECALL_r8).
    * Output shape matches the other top-k paths. */
  def pqTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, dim: Int, m: Int = 8, ksub: Int = 16, iters: Int = 2,
      seed: Long = 42L, rerank: Int = 0,
      trainFraction: Double = 1.0): DataFrame = {
    val books = pqTrain(corpus, corpusId, corpusVec, dim, m, ksub, iters,
      seed, trainFraction)
    val enc = pqEncode(corpus, corpusId, corpusVec, books, dim)
    val qd = queries.select(queryId.cast("long").as("query_id"),
        queryVec.as("qv"))
      .withColumn("lut", pqLut(col("qv"), books, dim))
      .withColumn("qnorm", norm(col("qv")))
    adcRank(enc, qd, k, rerank)
  }

  /** Shared ADC ranking tail of [[pqTopK]]/[[opqTopK]]: `enc` carries
    * (corpus_id, codes, vnorm, cv), `qd` (query_id, qv, lut, qnorm); the
    * ADC cosine ranks in the compressed domain, the optional rerank
    * re-scores the top-`rerank` candidates by exact cosine over the
    * ORIGINAL vectors. */
  private def adcRank(enc: DataFrame, qd: DataFrame, k: Int,
      rerank: Int): DataFrame = {
    val scored = graft.util.ParallelScan.widen(enc)
      .crossJoin(broadcast(qd))
      .withColumn("adc",
        when(col("qnorm") === 0.0d || col("vnorm") === 0.0d, lit(0.0d))
          .otherwise(adcDot(col("codes"), col("lut")) /
            (col("qnorm") * col("vnorm"))))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("corpus_id").asc)
    if (rerank <= 0)
      scored.withColumn("rank", row_number().over(wAdc))
        .filter(col("rank") <= k)
        .withColumn("cosine_micro",
          floor(col("adc") * 1000000).cast("long"))
        .select("query_id", "corpus_id", "rank", "cosine_micro")
    else {
      val cand = scored.withColumn("__r", row_number().over(wAdc))
        .filter(col("__r") <= math.max(rerank, k))
      val wCos = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("corpus_id").asc)
      cand.withColumn("cos", cosine(col("cv"), col("qv")))
        .withColumn("rank", row_number().over(wCos))
        .filter(col("rank") <= k)
        .withColumn("cosine_micro", floor(col("cos") * 1000000).cast("long"))
        .select("query_id", "corpus_id", "rank", "cosine_micro")
    }
  }

  /** `R · x` via the native [[graft.functions.MatVec]] kernel (r17): the
    * rotation ships as ONE stage reference object instead of a dim²
    * analyzed array literal per plan, and each coordinate is a primitive
    * fused loop instead of three interpreted lambda dispatches per
    * element — bit-identical arithmetic (property-pinned). The HOF form
    * is kept below as the property-test reference. */
  private def rotateCol(vec: Column, rot: Seq[Seq[Double]]): Column =
    graft.functions.CentroidOps.matVec(vec, rot)

  /** r16 HOF form of [[rotateCol]], the property-test reference. */
  private[graft] def rotateColViaHof(vec: Column,
      rot: Seq[Seq[Double]]): Column =
    transform(typedLit(rot), row =>
      aggregate(zip_with(row, vec, (a, b) => a * b), lit(0.0d),
        (acc, x) => acc + x))

  private def toFloats(a: Column): Column =
    transform(a, x => x.cast("float"))

  /** PCA model learned by [[pcaTrain]]: `mean` (length dim), `components`
    * — `rank` orthonormal rows in DESCENDING explained-variance order —
    * and the matching eigenvalues. Metadata-sized (rank·dim doubles):
    * persists as a plan literal, never shuffles. */
  case class PcaModel(mean: Seq[Double], components: Seq[Seq[Double]],
      variances: Seq[Double])

  /** Distributed PCA over an `array<float>` embedding column.
    *
    * ONE aggregation job computes the sufficient statistics — n, Σx
    * ([[graft.functions.VectorMeanAgg]]) and Σx·xᵀ ([[graft.functions
    * .OuterSumAgg]], zero per-row allocation, map-side combined) — so the
    * driver sees a single dim×dim row regardless of corpus size; the
    * dim×dim symmetric eigendecomposition runs on the driver via breeze
    * (`eigSym`, the same dependency [[opqTrain]]'s SVD uses). This is the
    * textbook covariance-method PCA and the right shape at 100 TB: the
    * data pass is embarrassingly parallel and the driver cost is dim³,
    * independent of rows.
    *
    * `center = true` (default) diagonalizes the covariance E[xxᵀ]−μμᵀ —
    * classical PCA. `center = false` diagonalizes the raw second moment
    * E[xxᵀ]: at `rank = dim` the components are then a pure ORTHOGONAL
    * basis change, so projection preserves dot products and norms exactly
    * — the property the full-rank exactness gate rides on (centering
    * would shift cosine).
    *
    * Eigenvector signs are canonicalized (largest-|coordinate| entry
    * positive) so the learned model is reproducible run to run. */
  def pcaTrain(corpus: DataFrame, id: Column, vec: Column, dim: Int,
      rank: Int, center: Boolean = true, trainFraction: Double = 1.0,
      seed: Long = 42L): PcaModel = {
    require(rank >= 1 && rank <= dim, s"rank must be in [1, $dim]")
    val c = trainSample(
      corpus.select(id.cast("long").as("id"), vec.as("v")),
      trainFraction, seed).filter(col("v").isNotNull)
    val row = c.agg(count(lit(1)).as("n"),
        graft.functions.VectorMeanAgg.vectorMean(col("v"), dim).as("mu"),
        graft.functions.OuterSumAgg.outerSum(col("v"), col("v"), dim, dim)
          .as("ss"))
      .collect()(0)
    val n = row.getLong(0)
    require(n > 0, "pcaTrain: empty (or fully-null) training set")
    val mu = row.getSeq[Double](1)
    val ss = row.getSeq[Double](2)
    val cov = breeze.linalg.DenseMatrix.tabulate[Double](dim, dim) {
      (i, j) =>
        ss(i * dim + j) / n - (if (center) mu(i) * mu(j) else 0.0)
    }
    val eig = breeze.linalg.eigSym(cov)
    // eigSym returns eigenvalues ASCENDING; take the top `rank` descending
    val order = (0 until dim).sortBy(i => -eig.eigenvalues(i)).take(rank)
    val comps = order.map { i =>
      val v = (0 until dim).map(j => eig.eigenvectors(j, i))
      val pivot = v.maxBy(math.abs)
      if (pivot < 0) v.map(-_) else v
    }
    PcaModel(if (center) mu else Seq.fill(dim)(0.0),
      comps, order.map(eig.eigenvalues(_)))
  }

  /** Project an `array<float>` column into the model's principal subspace
    * — (x − μ) through the component rows, one codegen'd dot per output
    * coordinate, model as a plan literal. Output: `array<float>` of
    * length rank. */
  def pcaProject(vec: Column, model: PcaModel): Column = {
    val centered =
      if (model.mean.forall(_ == 0.0)) vec
      else zip_with(vec, typedLit(model.mean), (x, m) => x - m)
    toFloats(rotateCol(centered, model.components))
  }

  /** Top-k cosine search THROUGH a PCA projection: candidates are ranked
    * by cosine in the rank-dimensional subspace (the scoring pass costs
    * rank/dim of the full-vector FLOPs and, with the projected corpus
    * materialized, rank/dim of the scan bytes — the 100 TB lever), then
    * the optional `rerank` re-scores the top candidates by exact cosine
    * over the ORIGINAL vectors, exactly like [[pqTopK]]'s rerank.
    *
    * Exactness gate: with `center = false` and `rank = dim` the
    * projection is an orthogonal basis change — subspace cosine IS the
    * true cosine — and full rerank makes the result brute force
    * regardless of rank. Realistic (rank, rerank) recall is priced in
    * RECALL_r14. */
  def pcaTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, dim: Int, rank: Int, center: Boolean = false,
      rerank: Int = 0, trainFraction: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    val model = pcaTrain(corpus, corpusId, corpusVec, dim, rank, center,
      trainFraction, seed)
    val c = corpus.select(corpusId.cast("long").as("corpus_id"),
        corpusVec.as("cv"))
      .withColumn("pv", pcaProject(col("cv"), model))
    val q = queries.select(queryId.cast("long").as("query_id"),
        queryVec.as("qv"))
      .withColumn("qp", pcaProject(col("qv"), model))
    val scored = graft.util.ParallelScan.widen(c)
      .crossJoin(broadcast(q))
      .withColumn("pcos", cosine(col("pv"), col("qp")))
    val wPca = Window.partitionBy("query_id")
      .orderBy(col("pcos").desc, col("corpus_id").asc)
    if (rerank <= 0)
      scored.withColumn("rank", row_number().over(wPca))
        .filter(col("rank") <= k)
        .withColumn("cosine_micro",
          floor(col("pcos") * 1000000).cast("long"))
        .select("query_id", "corpus_id", "rank", "cosine_micro")
    else {
      val cand = scored.withColumn("__r", row_number().over(wPca))
        .filter(col("__r") <= math.max(rerank, k))
      val wCos = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("corpus_id").asc)
      cand.withColumn("cos", cosine(col("cv"), col("qv")))
        .withColumn("rank", row_number().over(wCos))
        .filter(col("rank") <= k)
        .withColumn("cosine_micro",
          floor(col("cos") * 1000000).cast("long"))
        .select("query_id", "corpus_id", "rank", "cosine_micro")
    }
  }

  /** OPQ (Ge et al., non-parametric): learn an ORTHOGONAL rotation `R`
    * jointly with the codebooks so the product quantizer's subspace cuts
    * align with the data — lower quantization error, higher ADC recall at
    * the SAME serving cost (m codes per row; the rotation is a plan
    * literal applied once per vector/query). Alternates:
    *
    *  1. codebooks ← PQ-train on `R·x` ([[pqTrain]], all-subspace pass);
    *  2. `R` ← Procrustes update: maximize Σ⟨R·xᵢ, x̂ᵢ⟩ over orthogonal R
    *     (x̂ = the codebook reconstruction in rotated space), i.e.
    *     A = Σ xᵢ·x̂ᵢᵀ (ONE map-side-combined [[graft.functions
    *     .VectorMeanAgg]] over the flattened dim² outer products — the
    *     driver sees one dim×dim matrix), then A = U·S·Vᵀ ⇒ R = V·Uᵀ
    *     (64×64 SVD on the driver via breeze, which Spark bundles).
    *
    * Rotation preserves inner products (⟨Rq, Rx⟩ = ⟨q,x⟩), so ADC on
    * rotated codes approximates the SAME cosine and the exact-rerank
    * gates hold unchanged — OPQ moves only the approximation quality.
    * Training runs on the `trainFraction` hash-sample like the other
    * trainers. Returns (rotation rows, codebooks for rotated space). */
  def opqTrain(corpus: DataFrame, id: Column, vec: Column, dim: Int,
      m: Int, ksub: Int = 16, iters: Int = 2, opqIters: Int = 3,
      seed: Long = 42L, trainFraction: Double = 1.0)
      : (Seq[Seq[Double]], PqCodebooks) = {
    val dsub = dim / m
    // persisted across every alternation phase (r10): each OPQ round
    // re-reads the sample three times (codes+reconstruction, the outer
    // aggregate's probe side, the warm-start refit) — uncached that is
    // 3·opqIters corpus re-scans and re-samples
    val c = trainSample(graft.util.ParallelScan.widen(
      corpus.select(id.cast("long").as("id"), vec.as("v"))),
      trainFraction, seed).filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var rot: Seq[Seq[Double]] =
        (0 until dim).map(i => (0 until dim).map(j =>
          if (i == j) 1.0 else 0.0))
      def rotated: DataFrame =
        c.select(col("id"), toFloats(rotateCol(col("v"), rot)).as("v"))
      // The fused alternation round below runs a Lloyd pass itself, and a
      // final alignment pass closes the loop — so the initializer runs
      // iters−1 passes, keeping the TOTAL Lloyd schedule at
      // iters + opqIters passes exactly as before the r11 fusion.
      var books = pqTrain(c, col("id"), col("v"), dim, m, ksub,
        math.max(iters - 1, 0), seed)
      // ONE distributed job per alternation round (r11, closing VERDICT
      // r9/r10's carried cost item): Ge et al.'s non-parametric step runs
      // a Lloyd refinement AND the Procrustes update off the SAME code
      // assignment, so both reduce in one pass. Per (subspace, code) the
      // aggregate returns (count, mean rotated subvector, mean ORIGINAL
      // vector) — m·ksub tiny rows. The Lloyd means are the refit
      // codebooks; the Procrustes matrix folds on the driver from the
      // block identity A = Σ x·x̂ᵀ = Σ_{s,code} (Σ_{x∈code} x) · c_s[code]ᵀ
      // (x̂ is piecewise the code's centroid, so the dim² outer aggregate
      // the previous shape shipped per row reduces to m·ksub rank-1
      // terms — the r10 OuterSumAgg job AND the separate warm-start refit
      // job both dissolve into this one pass).
      for (_ <- 0 until opqIters) {
        val sub = c.select(col("v"),
            toFloats(rotateCol(col("v"), rot)).as("rv"))
          .select(col("v"), posexplode(array((0 until m).map(s =>
            subCol(col("rv"), s, dsub)): _*)).as(Seq("s", "sv")))
        val assigned = sub.withColumn("__code",
          (0 until m).map(s =>
              (s, element_at(nearestL2(col("sv"), books(s), 1), 1)))
            .foldLeft(lit(-1)) { case (acc, (s, e)) =>
              when(col("s") === s, e).otherwise(acc)
            })
        val folded = assigned.filter(col("sv").isNotNull)
          .groupBy("s", "__code")
          .agg(count(lit(1)).as("n"),
            graft.functions.VectorMeanAgg.vectorMean(col("sv"), dsub)
              .as("msv"),
            graft.functions.VectorMeanAgg.vectorMean(col("v"), dim)
              .as("mv"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) ->
            (r.getLong(2), r.getSeq[Double](3), r.getSeq[Double](4)))
          .toMap
        books = books.zipWithIndex.map { case (cents, s) =>
          cents.zipWithIndex.map { case (v0, code) =>
            folded.get((s, code))
              .map(_._2.map(_.toFloat): Seq[Float])
              .getOrElse(v0) // empty cell keeps its centroid
          }
        }
        val a = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
        folded.foreach { case ((s, code), (n, _, mv)) =>
          if (code >= 0) {
            val cvec = books(s)(code)
            var i = 0
            while (i < dim) {
              var j = 0
              while (j < dsub) {
                a(i, s * dsub + j) += n.toDouble * mv(i) * cvec(j)
                j += 1
              }
              i += 1
            }
          }
        }
        val svd = breeze.linalg.svd(a)
        // maximize tr(R·A), A = U·S·Vᵀ ⇒ R = V·Uᵀ
        val r = svd.Vt.t * svd.U.t
        rot = (0 until dim).map(i => (0 until dim).map(j => r(i, j)))
      }
      // the loop leaves `books` trained under the PREVIOUS rotation; one
      // final warm-started Lloyd pass aligns them with the served one
      books = pqTrain(rotated, col("id"), col("v"), dim, m, ksub,
        iters = 1, seed, init = Some(books))
      (rot, books)
    } finally c.unpersist()
  }

  /** [[pqTopK]] with an OPQ-learned rotation: identical serving cost and
    * identical exactness under full rerank (rotation preserves the dot),
    * better ADC recall at realistic rerank (measured in RECALL_r9). */
  def opqTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, dim: Int, m: Int = 8, ksub: Int = 16, iters: Int = 2,
      seed: Long = 42L, rerank: Int = 0, opqIters: Int = 3,
      trainFraction: Double = 1.0): DataFrame = {
    val dsub = dim / m
    val (rot, books) = opqTrain(corpus, corpusId, corpusVec, dim, m, ksub,
      iters, opqIters, seed, trainFraction)
    val enc = corpus.select(corpusId.cast("long").as("corpus_id"),
        corpusVec.as("cv"))
      .withColumn("rv", toFloats(rotateCol(col("cv"), rot)))
      .withColumn("codes", array((0 until m).map(s =>
        element_at(nearestL2(subCol(col("rv"), s, dsub), books(s), 1),
          1)): _*))
      .withColumn("vnorm", norm(col("cv"))) // ‖x‖ = ‖R·x‖
      .drop("rv")
    val qd = queries.select(queryId.cast("long").as("query_id"),
        queryVec.as("qv"))
      .withColumn("rq", toFloats(rotateCol(col("qv"), rot)))
      .withColumn("lut", pqLut(col("rq"), books, dim))
      .withColumn("qnorm", norm(col("qv")))
      .drop("rq")
    adcRank(enc, qd, k, rerank)
  }

  // ---- IVF-PQ: the composed 100 TB serving layout ----------------------
  //
  // IVF gives SELECTION (probes read only their cells' directories);
  // PQ gives per-row COMPRESSION (ADC scores m codes, never the vector).
  // Composed, a query reads nprobe cells' (codes, vnorm) columns — the
  // full vectors enter exactly one plan: the exact-cosine rerank of the
  // ADC top-`rerank` candidates, joined back by id. At dim 1024 / m 16 /
  // nprobe 1/32 of cells that is a ~8000× reduction in bytes scanned per
  // query vs brute force. Codebooks quantize RAW vectors (not IVF
  // residuals — simpler, one codebook set for all cells; residual PQ is a
  // recall refinement, not a structural change).

  /** Materialize the IVF-PQ serving index at `path`: one partition
    * directory per centroid cell, rows (corpus_id, codes, vnorm, cv).
    * Returns (centroids, codebooks) — persist both app-side (or re-derive
    * with the same seed); [[graft.Fixtures.ivfPqDir]] shows the shape.
    *
    * `residual = true` (default, the FAISS-standard refinement): the
    * codebooks quantize x − centroid(cell) instead of x, so the code
    * budget spends its precision on what differs WITHIN a cell. The
    * benefit is data-dependent: on clustered corpora (where the centroid
    * explains much of each vector) residuals are far smaller than raw
    * vectors and recall rises; on the near-uniform synthetic bench
    * embeddings the two modes measure within noise — RECALL_r8.json
    * reports BOTH at the same setting, so the trade is visible, not
    * asserted. Storage/scan cost is identical either way. The read path
    * must be called with the SAME `residual` flag the index was written
    * with. */
  def ivfPqWrite(corpus: DataFrame, id: Column, vec: Column, path: String,
      dim: Int, nlist: Int, m: Int = 8, ksub: Int = 16, iters: Int = 2,
      seed: Long = 42L,
      residual: Boolean = true,
      trainFraction: Double = 1.0,
      rotation: Option[Seq[Seq[Double]]] = None)
      : (Seq[(Int, Seq[Float])], PqCodebooks) = {
    // OPQ composition (r11): with a `rotation`, the whole IVF-PQ
    // machinery — coarse training, cell assignment, residuals, codebook
    // training, encoding — runs in ROTATED space (FAISS's
    // OPQ-as-pretransform, `OPQm,IVFn,PQm`), while the stored `cv` stays
    // the ORIGINAL vector so the exact-cosine rerank (and its oracle
    // gate) are untouched. Rotation preserves dots and norms, so the ADC
    // scores approximate the same cosine — only the approximation
    // quality moves.
    val base = corpus.select(id.cast("long").as("corpus_id"), vec.as("cv"))
      .withColumn("v",
        rotation.fold(col("cv"))(r => toFloats(rotateCol(col("cv"), r))))
    val centroids = ivfTrain(base, col("corpus_id"), col("v"), nlist,
      iters, seed, trainFraction)
    val assigned = assignToCentroid(base, centroids)
    // what the codebooks see: the residual against the row's own cell
    // centroid, or the (possibly rotated) vector
    val encIn = assigned.withColumn("enc",
      residualCol(residual, centroids))
    val books = pqTrain(encIn, col("corpus_id"), col("enc"), dim, m, ksub,
      iters, seed, trainFraction)
    pqEncodeFrame(encIn, books, dim, m)
      .write.mode("overwrite").partitionBy("__cluster").parquet(path)
    (centroids, books)
  }

  /** [[ivfPqWrite]] with an OPQ-learned rotation trained first: the
    * production `OPQm,IVFnlist,PQm` layout. Returns (rotation, centroids,
    * codebooks) — persist all three; queries pass the same rotation to
    * [[ivfPqTopKFromTable]]. Serving cost identical to plain IVF-PQ. */
  def ivfOpqWrite(corpus: DataFrame, id: Column, vec: Column, path: String,
      dim: Int, nlist: Int, m: Int = 8, ksub: Int = 16, iters: Int = 2,
      opqIters: Int = 3, seed: Long = 42L, residual: Boolean = true,
      trainFraction: Double = 1.0)
      : (Seq[Seq[Double]], Seq[(Int, Seq[Float])], PqCodebooks) = {
    val (rot, _) = opqTrain(corpus, id, vec, dim, m, ksub, iters,
      opqIters, seed, trainFraction)
    val (cents, books) = ivfPqWrite(corpus, id, vec, path, dim, nlist, m,
      ksub, iters, seed, residual, trainFraction, rotation = Some(rot))
    (rot, cents, books)
  }

  /** [[ivfPqWrite]] behind a PCA pre-transform — FAISS's
    * `PCAR<rank>,IVF<nlist>,PQ<m>` index-factory chain: an UNCENTERED
    * rank-dim PCA is trained first ([[pcaTrain]] — uncentered so the
    * projection stays a partial orthogonal transform and subspace dots
    * remain true partial dots), then the ENTIRE IVF-PQ machinery — coarse
    * cells, residuals, codebooks, ADC probing — runs in the rank-dim
    * principal subspace (the rotation plumbing with a rank×dim matrix
    * and dim = rank): coarse/codebook TRAINING and probe FLOPs drop by
    * rank/dim, PQ's m subspaces cut the informative rank dims instead of
    * spreading over all dim (m must divide rank), while the stored `cv`
    * stays the ORIGINAL vector so the exact-cosine rerank — and the
    * exhaustive-probe + full-rerank oracle gate — are untouched.
    *
    * Returns (components, centroids, codebooks); queries pass the same
    * components as `rotation` to [[ivfPqTopKFromTable]] with
    * `dim = rank`. */
  def ivfPcaWrite(corpus: DataFrame, id: Column, vec: Column, path: String,
      dim: Int, rank: Int, nlist: Int, m: Int = 8, ksub: Int = 16,
      iters: Int = 2, seed: Long = 42L, residual: Boolean = true,
      trainFraction: Double = 1.0)
      : (Seq[Seq[Double]], Seq[(Int, Seq[Float])], PqCodebooks) = {
    require(rank % m == 0, s"m=$m must divide rank=$rank")
    val model = pcaTrain(corpus, id, vec, dim, rank, center = false,
      trainFraction, seed)
    val (cents, books) = ivfPqWrite(corpus, id, vec, path, dim = rank,
      nlist, m, ksub, iters, seed, residual, trainFraction,
      rotation = Some(model.components))
    (model.components, cents, books)
  }

  /** SELF-DESCRIBING persisted ANN index: the full `IVF<nlist>,PQ<m>`
    * family (`variant` ∈ pq | opq | pca) built under `dir` with its
    * metadata sidecars — `data/` (the cell-partitioned codes+vectors
    * table), `centroids/`, `codebooks/`, `rotation/` (absent for plain
    * pq), `meta/` (variant, rotated dim, residual flag) — so a search
    * needs ONLY the directory. This is what the SQL surface
    * (`CALL ann_index_build` / `ann_search`) serves from; the sidecars
    * are metadata-sized parquet (nlist·dim + m·ksub·dsub floats).
    * Returns (cells, rotated dim). */
  def annIndexBuild(corpus: DataFrame, id: Column, vec: Column,
      dir: String, dim: Int, nlist: Int, m: Int = 8, ksub: Int = 16,
      iters: Int = 2, seed: Long = 42L, residual: Boolean = true,
      trainFraction: Double = 1.0, variant: String = "pq",
      rank: Int = 0, opqIters: Int = 3): (Int, Int) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dataDir = s"$dir/data"
    val (rot, cents, books, rdim) = variant match {
      case "pq" =>
        val (c, b) = ivfPqWrite(corpus, id, vec, dataDir, dim, nlist, m,
          ksub, iters, seed, residual, trainFraction)
        (None: Option[Seq[Seq[Double]]], c, b, dim)
      case "opq" =>
        val (r, c, b) = ivfOpqWrite(corpus, id, vec, dataDir, dim, nlist,
          m, ksub, iters, opqIters, seed, residual, trainFraction)
        (Some(r), c, b, dim)
      case "pca" =>
        require(rank > 0, "variant=pca needs rank > 0")
        val (r, c, b) = ivfPcaWrite(corpus, id, vec, dataDir, dim, rank,
          nlist, m, ksub, iters, seed, residual, trainFraction)
        (Some(r), c, b, rank)
      case other => throw new IllegalArgumentException(
        s"variant must be pq | opq | pca (got '$other')")
    }
    cents.map { case (i, v) => (i, v) }.toDF("i", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    books.zipWithIndex.flatMap { case (cs, s) =>
      cs.zipWithIndex.map { case (v, code) => (s, code, v) }
    }.toDF("s", "code", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    rot.foreach(r =>
      r.zipWithIndex.map { case (row, i) => (i, row) }.toDF("i", "row")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/rotation"))
    Seq((variant, rdim, residual)).toDF("variant", "rdim", "residual")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    (cents.size, rdim)
  }

  /** An [[annIndexBuild]] directory's metadata sidecars, loaded. All
    * metadata-sized (nlist·dim centroids, m·ksub·dsub codebook floats,
    * a dim² rotation at most) — never data-sized. */
  private case class AnnIndex(variant: String, rdim: Int,
      residual: Boolean, cents: Seq[(Int, Seq[Float])],
      books: PqCodebooks, rot: Option[Seq[Seq[Double]]])

  private def annLoad(spark: org.apache.spark.sql.SparkSession,
      dir: String): AnnIndex = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val variant = meta.getString(0)
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toList: Seq[Float]))
      .sortBy(_._1).toSeq
    val bookRows = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Float](2).toList: Seq[Float]))
    val books: PqCodebooks = bookRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    val rot: Option[Seq[Seq[Double]]] =
      if (variant == "pq") None
      else Some(spark.read.parquet(s"$dir/rotation").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toList: Seq[Double]))
        .sortBy(_._1).map(_._2).toSeq)
    AnnIndex(variant, meta.getInt(1), meta.getBoolean(2), cents, books,
      rot)
  }

  /** `__cluster=` partition directories under a cell-partitioned root;
    * empty when the root does not exist (a zero-row ingest batch). */
  private def listCells(spark: org.apache.spark.sql.SparkSession,
      root: String): Set[Int] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("__cluster=") =>
        n.stripPrefix("__cluster=").toInt
      }.toSet
  }

  // ---- .ann generations + ingest/tombstone ledgers ----------------------
  //
  // Layout under an [[annIndexBuild]] directory (all pieces optional
  // except the build itself):
  //   data/ centroids/ codebooks/ rotation/ meta/   the build (gen 0)
  //   batches/<batchId>/                            one ingest batch each
  //   ledger/<batchId>.json                         the batch's COMMIT
  //   tombstones/<deleteId>/                        one tombstone set each
  //   tombledger/<deleteId>.json                    the set's COMMIT
  //   gen/g<NNNNN>/{<same layout>, COMMITTED}       one rebuild each
  //
  // VISIBLE-OR-ABSENT: a batch is served iff its ledger entry exists —
  // annIngest stages the encoded rows under batches/<batchId>/ first and
  // creates the ledger file LAST (one atomic create), so a job failure
  // after partial task commit leaves an unledgered (invisible) batch a
  // re-run simply overwrites. The ledger FILE's existence is the commit;
  // its JSON body (row count) is advisory — consumers must tolerate a
  // truncated/empty body (a crash between create and close), and none
  // parse it today. Tombstone sets ([[annDelete]]) follow the identical
  // protocol under tombstones/ + tombledger/. A rebuild ([[annRebuild]])
  // is the same protocol one level up: the new generation directory is
  // fully built (ledgered batches folded into its data/, tombstoned rows
  // physically EXCLUDED), then its COMMITTED marker is created last;
  // readers serve the NEWEST committed generation, so a crashed rebuild
  // leaves the old index serving. Prior ledger/tombledger entries are
  // carried into the new generation as FOLDED records (no data dir), so
  // a replayed batch/delete id still refuses after a rebuild.
  //
  // WRITER/REBUILD FENCE (r17): a rebuild snapshots the serving root's
  // ledger+tombledger names BEFORE reading the corpus, re-lists them
  // immediately before creating COMMITTED (aborting — new generation
  // deleted, nothing committed — if entries appeared: their data would
  // not be in the new generation), and re-lists once more AFTER the
  // marker create, rolling the marker back and aborting if an entry
  // landed in the commit window. Symmetrically, annIngest/annDelete
  // re-resolve the serving root AFTER their ledger create and, if a
  // rebuild committed underneath them, SELF-REVOKE (delete their own
  // entry + staging in the now-dead root) and throw a retryable error —
  // so every interleaving ends with the entry either served or loudly
  // absent, never silently dropped into a dead generation.

  /** The serving root of an `.ann` directory: the newest COMMITTED
    * rebuild generation, else the build itself. */
  private[graft] def annRoot(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val g = new org.apache.hadoop.fs.Path(s"$dir/gen")
    val fs = g.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(g)) dir
    else fs.listStatus(g).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "COMMITTED")))
      .map(_.toString).sorted.lastOption.getOrElse(dir)
  }

  /** Committed entry names (sorted) of one of a root's ledgers
    * (`ledger` or `tombledger`). */
  private def ledgerNames(fs: org.apache.hadoop.fs.FileSystem,
      root: String, sub: String): Seq[String] = {
    val lp = new org.apache.hadoop.fs.Path(s"$root/$sub")
    if (!fs.exists(lp)) Seq.empty
    else fs.listStatus(lp).map(_.getPath.getName)
      .collect { case n if n.endsWith(".json") => n.stripSuffix(".json") }
      .sorted.toSeq
  }

  /** The cell-partitioned data roots a search reads AGAINST A RESOLVED
    * serving root: its build data plus every LEDGERED ingest batch
    * (staged-but-uncommitted batch dirs are invisible — the crash-window
    * contract; a FOLDED ledger record has no batch dir and contributes
    * nothing). One resolved root must feed sidecar load, data roots and
    * tombstones alike — resolving twice lets a concurrent rebuild serve
    * one generation's sidecars against another's data. */
  private[graft] def annDataRootsOf(
      spark: org.apache.spark.sql.SparkSession,
      root: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ledgered = ledgerNames(fs, root, "ledger")
      .map(b => s"$root/batches/$b")
      .filter(b => fs.exists(new org.apache.hadoop.fs.Path(b)))
    s"$root/data" +: ledgered
  }

  /** [[annDataRootsOf]] against the CURRENT serving generation. */
  def annDataRoots(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] =
    annDataRootsOf(spark, annRoot(spark, dir))

  /** The resolved root's LEDGERED tombstone ids as one distinct id frame
    * (None with no committed tombstone set). Tombstone sets are
    * takedown-sized — the frame is broadcast into the serving
    * anti-join. Folded tombledger records (post-rebuild: the rows are
    * physically gone from data/) have no tombstones dir and contribute
    * nothing. */
  private[graft] def annTombstonesOf(
      spark: org.apache.spark.sql.SparkSession,
      root: String): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sets = ledgerNames(fs, root, "tombledger")
      .map(t => s"$root/tombstones/$t")
      .filter(t => fs.exists(new org.apache.hadoop.fs.Path(t)))
    if (sets.isEmpty) None
    else Some(sets.map(r => spark.read.parquet(r).select(col("corpus_id")))
      .reduce(_ unionByName _).distinct())
  }

  /** Top-k against an [[annIndexBuild]] directory: resolves the serving
    * generation ONCE (sidecars, data roots and tombstones all come from
    * that one resolution — a rebuild committing mid-call cannot mix
    * generations), then probes the build data plus every ledgered
    * ingest batch with the recorded variant's rotation and rotated dim,
    * anti-joining the ledgered tombstone ids BEFORE candidate ranking
    * (deleted rows neither surface nor occupy rerank slots). Exhaustive
    * probe + full rerank ≡ brute force over corpus-minus-deleted for
    * every variant (rerank reads the stored ORIGINAL vectors). */
  def annTopK(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, nprobe: Int = 2, rerank: Int = 50): DataFrame = {
    val root = annRoot(spark, dir)
    val idx = annLoad(spark, root)
    ivfPqTopKFromRoots(spark, annDataRootsOf(spark, root), idx.cents,
      idx.books, queries, queryId, queryVec, k, dim = idx.rdim,
      nprobe = nprobe, rerank = rerank, residual = idx.residual,
      rotation = idx.rot, exclude = annTombstonesOf(spark, root))
  }

  /** INCREMENTAL append into an [[annIndexBuild]] directory — the
    * operational path that lets a growing corpus ADD vectors instead of
    * rebuilding (FAISS `IndexIVFPQ.add` through the persisted sidecars).
    * The batch is transformed with the STORED rotation (OPQ rotation or
    * PCA projection; identity for plain pq), assigned and PQ-encoded
    * against the FROZEN centroids and codebooks, staged under
    * `batches/<batchId>/`, and COMMITTED by one atomic ledger-file
    * create — so the batch is visible-or-absent (a failed job leaves no
    * half-served rows) and a RE-ARRIVING batch id refuses loudly instead
    * of silently double-serving its vectors (the idempotency guard the
    * dedup ingest paths enforce by doc id). No sidecar changes, no
    * rewrite of existing cells, cost ∝ the batch. Returns the row count
    * actually committed (counted ONCE, from the staged files' footers).
    * Exactness contract unchanged: [[annTopK]] at exhaustive probe +
    * full rerank over the grown index ≡ brute force over the union
    * (gated `q_ann_ingest_topk`); at realistic settings a model trained
    * before the batch arrived quantizes it slightly worse until the
    * next [[annRebuild]] — the drift trade priced in RECALL_r*.json.
    *
    * Operational bound: each ledgered batch adds one scan branch per
    * probed cell to the serving plan ([[ivfPqTopKFromRoots]] unions the
    * roots), so thousands of small batches bloat plans — fold them
    * periodically via [[annRebuild]] (+ [[annClean]]); the rebuild
    * cadence bounds both the recall drift and the root count. */
  def annIngest(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch: DataFrame, id: Column, vec: Column,
      batchId: String): Long = {
    require(batchId.nonEmpty && batchId.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"batchId '$batchId' must be a filename-safe token " +
        "([A-Za-z0-9._-]+) — it names the batch's ledger entry")
    val root = annRoot(spark, dir)
    val ledgerFile =
      new org.apache.hadoop.fs.Path(s"$root/ledger/$batchId.json")
    val fs = ledgerFile.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(ledgerFile),
      s"ann ingest batch '$batchId' was already committed into $dir — " +
        "a replayed batch would serve its vectors twice; use a new " +
        "batch id (or annRebuild to fold and retrain)")
    val idx = annLoad(spark, root)
    val stage = s"$root/batches/$batchId"
    // overwrite clobbers the remains of a crashed earlier attempt of the
    // SAME id — unledgered, so it was never visible
    encodeAgainst(batch, id, vec, idx)
      .write.mode("overwrite").partitionBy("__cluster").parquet(stage)
    // count once, from the staged parquet footers (metadata-only)
    val n =
      if (listCells(spark, stage).isEmpty) 0L
      else spark.read.parquet(stage).count()
    commitLedgerEntry(fs, ledgerFile,
      s"""{"batch_id":"$batchId","n_rows":$n,"folded":false}\n""")
    annIngestBeforeFenceHook()
    // writer/rebuild fence: a rebuild that committed while this batch
    // encoded either folded this entry forward (then it is served) or
    // stranded it in a dead generation (then self-revoke + retry error)
    ensureRootUnchanged(spark, dir, root, "ledger", batchId, ledgerFile,
      stage, s"ann ingest batch '$batchId'")
    n
  }

  /** One atomic ledger create: the file's EXISTENCE is the commit; the
    * JSON body is advisory (a crash between create and close can leave
    * it empty — consumers must never treat body content as the
    * contract). */
  private def commitLedgerEntry(fs: org.apache.hadoop.fs.FileSystem,
      ledgerFile: org.apache.hadoop.fs.Path, json: String): Unit = {
    val out = fs.create(ledgerFile, false) // atomic create IS the commit
    try out.write(json.getBytes("UTF-8"))
    finally out.close()
  }

  /** The ingest/delete side of the r17 writer/rebuild fence. If the
    * serving root changed since `root` was resolved, a rebuild committed
    * underneath this writer; two consistent outcomes:
    *
    *  - the writer's entry made the rebuild's snapshot (entry created
    *    before the rebuild listed its ledger — staging completes before
    *    the entry create, so the data was read too): the new generation
    *    carries the id as a FOLDED record and serves the data — the
    *    write simply SUCCEEDED through the fold;
    *  - it did not (the rebuild's own fences abort on entries that
    *    appear mid-flight, so this means a rebuild that never saw us
    *    won the race in a way its fences resolved against us): the
    *    entry sits in a dead generation — delete it and its staging
    *    (loudly ABSENT) and throw a retryable error.
    *
    * Between this check and [[annRebuild]]'s pre/post-commit re-lists,
    * no interleaving silently drops a committed batch or tombstone. */
  private def ensureRootUnchanged(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      root: String, sub: String, entryId: String,
      ledgerFile: org.apache.hadoop.fs.Path,
      stage: String, what: String): Unit = {
    val now = annRoot(spark, dir)
    if (now != root) {
      val fs =
        ledgerFile.getFileSystem(spark.sessionState.newHadoopConf())
      val folded =
        new org.apache.hadoop.fs.Path(s"$now/$sub/$entryId.json")
      if (!fs.exists(folded)) {
        fs.delete(ledgerFile, false): Unit
        fs.delete(new org.apache.hadoop.fs.Path(stage), true): Unit
        throw new IllegalStateException(
          s"$what raced a concurrent annRebuild commit on $dir: the " +
            "entry landed in a superseded generation and was revoked " +
            "(nothing is committed) — re-run it against the new " +
            "serving generation")
      }
      // else: the rebuild snapshotted this entry and folded it forward —
      // the data is in the new generation; the write succeeded
    }
  }

  /** TEST-ONLY interleaving hooks for the writer/rebuild fence specs —
    * no-ops in production. [[annRebuildBeforeCommitHook]] fires (with
    * the old serving root) after the new generation is built and folded
    * but BEFORE the pre-commit fence; [[annIngestBeforeFenceHook]]
    * fires after a writer's ledger create but BEFORE its root check. */
  @volatile private[graft] var annRebuildBeforeCommitHook
      : String => Unit = _ => ()
  @volatile private[graft] var annIngestBeforeFenceHook
      : () => Unit = () => ()

  /** STREAMING-driven [[annIngest]] — the `foreachBatch` body for a
    * `readStream`-fed vector corpus maintaining a `.ann` index:
    *
    * {{{
    * embStream.writeStream.foreachBatch { (b: DataFrame, bid: Long) =>
    *   Similarity.annIngestBatch(spark, dir, b,
    *     col("vec_id"), col("embedding"), s"stream-$bid"): Unit
    * }.option("checkpointLocation", ckpt).start()
    * }}}
    *
    * Exactly-once under engine replay falls straight out of the ledger:
    * the micro-batch id names the ledger entry, so a replayed batch —
    * whose predecessor crashed AFTER the ledger commit but before the
    * checkpoint write — is detected by its existing entry and SKIPPED
    * (returns None) instead of refused; a predecessor that crashed
    * before the ledger commit left an invisible staged dir the re-run
    * overwrites. Returns Some(rows committed) when the batch lands. */
  def annIngestBatch(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: DataFrame, id: Column, vec: Column,
      batchId: String): Option[Long] = {
    val root = annRoot(spark, dir)
    val lf = new org.apache.hadoop.fs.Path(s"$root/ledger/$batchId.json")
    if (lf.getFileSystem(spark.sessionState.newHadoopConf()).exists(lf))
      None // replay of a committed micro-batch
    else Some(annIngest(spark, dir, batch, id, vec, batchId))
  }

  /** DELETE rows from a `.ann` index — the takedown verb: the id set is
    * staged under `tombstones/<deleteId>/` and COMMITTED by one atomic
    * `tombledger/<deleteId>.json` create (the exact visible-or-absent
    * protocol of [[annIngest]]). From that commit on, [[annTopK]]
    * anti-joins the tombstoned ids BEFORE candidate ranking (the rows
    * neither surface nor occupy rerank slots), and the next
    * [[annRebuild]] EXCLUDES them when it reads the stored vectors —
    * tombstone filtering is the serving-time story, the rebuild is the
    * PHYSICAL removal (after which the set's id is carried as a folded
    * record, so a replayed deleteId still refuses). A re-arriving
    * deleteId refuses loudly (delete a different slice under a new id —
    * re-deleting already-tombstoned rows is a no-op set union, not an
    * error, as long as the SET id is fresh). Ids need not currently be
    * in the index (a tombstone can arrive ahead of a batch that will
    * never be served — the anti-join is by id). Returns the distinct id
    * count committed.
    *
    * Scale: a tombstone set is takedown-sized (ids only, no vectors);
    * serving broadcasts the union of ledgered sets into the probed-cell
    * scan — rebuild cadence bounds that union exactly as it bounds the
    * batch-root count. */
  def annDelete(spark: org.apache.spark.sql.SparkSession, dir: String,
      ids: DataFrame, idCol: Column, deleteId: String): Long = {
    require(deleteId.nonEmpty && deleteId.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"deleteId '$deleteId' must be a filename-safe token " +
        "([A-Za-z0-9._-]+) — it names the set's tombledger entry")
    val root = annRoot(spark, dir)
    val ledgerFile =
      new org.apache.hadoop.fs.Path(s"$root/tombledger/$deleteId.json")
    val fs = ledgerFile.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(ledgerFile),
      s"ann tombstone set '$deleteId' was already committed into $dir " +
        "— use a new delete id (replaying a takedown must be " +
        "detectable, not silent)")
    val stage = s"$root/tombstones/$deleteId"
    ids.select(idCol.cast("long").as("corpus_id")).distinct()
      .write.mode("overwrite").parquet(stage)
    val n = spark.read.parquet(stage).count()
    commitLedgerEntry(fs, ledgerFile,
      s"""{"delete_id":"$deleteId","n_ids":$n,"folded":false}\n""")
    annIngestBeforeFenceHook()
    ensureRootUnchanged(spark, dir, root, "tombledger", deleteId,
      ledgerFile, stage, s"ann tombstone set '$deleteId'")
    n
  }

  /** STREAMING-driven [[annDelete]] — the `foreachBatch` body of a
    * CDC-tailed takedown pipeline maintaining a `.ann` index:
    *
    * {{{
    * spark.readStream.format("graft").option("cdc", "true").load(tbl)
    *   .filter(col("_change_type") === "delete")
    *   .writeStream.foreachBatch { (b: DataFrame, bid: Long) =>
    *     Similarity.annDeleteBatch(spark, dir, b,
    *       col("vec_id"), s"stream-td-$bid"): Unit
    *   }.option("checkpointLocation", ckpt).start()
    * }}}
    *
    * Exactly-once falls out of the tombledger exactly as ingest's does
    * out of the ledger: the micro-batch id names the entry, a replayed
    * committed batch SKIPS (None), a crashed-before-commit attempt left
    * an invisible staged set the re-run overwrites. An EMPTY
    * micro-batch returns None without minting a ledger entry (a busy
    * CDC stream with few deletes must not bloat the tombledger with
    * empty sets). Returns Some(distinct ids committed) when the set
    * lands. */
  def annDeleteBatch(spark: org.apache.spark.sql.SparkSession,
      dir: String, ids: DataFrame, idCol: Column,
      deleteId: String): Option[Long] = {
    val root = annRoot(spark, dir)
    val lf =
      new org.apache.hadoop.fs.Path(s"$root/tombledger/$deleteId.json")
    if (lf.getFileSystem(spark.sessionState.newHadoopConf()).exists(lf))
      None // replay of a committed micro-batch
    else if (ids.isEmpty) None // no deletes this batch: no empty sets
    else Some(annDelete(spark, dir, ids, idCol, deleteId))
  }

  /** Reclaim a rebuilt `.ann` directory's DEAD state, with a RETENTION
    * WINDOW for in-flight readers (r17, the table-clean stance): the
    * newest `keepGenerations` generations — counting the top-level
    * build as the oldest — survive; every COMMITTED generation older
    * than the window, every UNCOMMITTED generation numbered BELOW the
    * serving one (a crashed old rebuild's partial), and (once outside
    * the window) the folded top-level build pieces are deleted. An
    * uncommitted generation numbered ABOVE the serving one is NEVER
    * touched — it may be a rebuild in flight; a crashed one is
    * reclaimed by the next successful rebuild+clean cycle, once a newer
    * committed generation outranks it. The serving generation is never
    * deleted; with no committed generation nothing is (the top level IS
    * the index). `keepGenerations = 2` (default) lets a reader that
    * resolved the PREVIOUS generation just before a rebuild finish its
    * scan across a concurrent clean; 1 restores eager reclamation (the
    * caller asserts no concurrent readers). Returns the deleted
    * paths. */
  def annClean(spark: org.apache.spark.sql.SparkSession,
      dir: String, keepGenerations: Int = 2): Seq[String] = {
    require(keepGenerations >= 1,
      s"keepGenerations must be >= 1 (got $keepGenerations) — the " +
        "serving generation is always retained")
    val root = annRoot(spark, dir)
    if (root == dir) return Seq.empty // no committed generation
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val genDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/gen"))
      .filter(_.isDirectory).map(_.getPath).toSeq
    val committed = genDirs
      .filter(g => fs.exists(new org.apache.hadoop.fs.Path(g, "COMMITTED")))
      .map(_.toString).sorted // ascending; last == root
    def genNum(path: org.apache.hadoop.fs.Path): Int =
      try path.getName.stripPrefix("g").toInt
      catch { case _: NumberFormatException => Int.MaxValue }
    val servingNum = genNum(new org.apache.hadoop.fs.Path(root))
    // generation sequence oldest → newest; the top-level build occupies
    // the oldest slot only while its data still exists (an earlier clean
    // may have reclaimed it already)
    val hasTopLevel =
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data"))
    val seq: Seq[String] = (if (hasTopLevel) Seq(dir) else Seq.empty) ++
      committed
    val retained = seq.takeRight(keepGenerations).toSet + root
    val deadGens = genDirs.filter { g =>
      val s = g.toString
      if (retained(s)) false
      else if (committed.contains(s)) true // committed, aged out
      else genNum(g) < servingNum // crashed OLD rebuild only
    }
    val topLevel =
      if (retained(dir)) Seq.empty
      else Seq("data", "batches", "ledger", "tombstones", "tombledger",
        "centroids", "codebooks", "rotation", "meta")
        .map(n => new org.apache.hadoop.fs.Path(s"$dir/$n"))
        .filter(fs.exists)
    (deadGens ++ topLevel).map { q =>
      fs.delete(q, true): Unit
      q.toString
    }
  }

  /** Assign + encode a raw batch against a loaded index's frozen
    * rotation/centroids/codebooks — the stored row shape. */
  private def encodeAgainst(batch: DataFrame, id: Column, vec: Column,
      idx: AnnIndex): DataFrame = {
    val base = batch.select(id.cast("long").as("corpus_id"), vec.as("cv"))
      .withColumn("v",
        idx.rot.fold(col("cv"))(r => toFloats(rotateCol(col("cv"), r))))
    val assigned = assignToCentroid(base, idx.cents)
    val encIn = assigned.withColumn("enc",
      residualCol(idx.residual, idx.cents))
    pqEncodeFrame(encIn, idx.books, idx.rdim, idx.books.size)
  }

  /** The encode paths' residual column (`v − centroid(__cluster)`, float
    * arithmetic), as ONE native expression node
    * ([[graft.functions.CentroidResidual]]): the centroid matrix ships
    * as a stage reference object, so the analyzed plan stays
    * constant-size in nlist — the same engineering as the assignment
    * kernel ([[assignToCentroid]]); the pre-r17 `zip_with(v,
    * element_at(typedLit(cents), …))` form embedded an O(nlist·dim)
    * array literal in every encode plan. Bit-identical to the HOF form
    * it replaced (property-pinned in PipelineSpec via
    * [[residualViaExprForm]]). */
  private def residualCol(residual: Boolean,
      centroids: Seq[(Int, Seq[Float])]): Column =
    if (residual)
      graft.functions.CentroidOps.residual(col("v"), col("__cluster"),
        centroids.sortBy(_._1).map(_._2))
    else col("v")

  /** The pre-r17 declarative residual — kept ONLY as the independent
    * reference formulation the PipelineSpec equality property pins the
    * native kernel against. */
  private[graft] def residualViaExprForm(v: Column, cluster: Column,
      centroids: Seq[(Int, Seq[Float])]): Column = {
    val centsF: Seq[Seq[Float]] = centroids.sortBy(_._1).map(_._2)
    zip_with(v, element_at(typedLit(centsF), cluster + 1),
      (a, b) => a - b)
  }

  /** The pre-r17 declarative query·centroid dot — kept ONLY as the
    * reference formulation for the PipelineSpec equality pin of
    * [[graft.functions.CentroidQueryDot]]. */
  private[graft] def queryDotViaExprForm(q: Column, cluster: Column,
      centsD: Seq[Seq[Double]]): Column =
    aggregate(zip_with(q,
      element_at(typedLit(centsD), cluster + 1),
      (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** RETRAIN an [[annIndexBuild]] directory over its GROWN corpus — the
    * drift-recovery verb: [[annIngest]] serves new vectors through
    * centroids/codebooks trained before they arrived (recall drifts, the
    * RECALL_r*.json `ann_ingest_grown` row prices it); annRebuild reads
    * every stored ORIGINAL vector (build data + all ledgered batches —
    * the source table is NOT needed) MINUS the ledgered tombstone ids
    * ([[annDelete]] — the rebuild IS the physical removal), re-trains
    * the same variant at the same shape, and writes a NEW generation
    * under `gen/`, committed by one atomic marker create. Readers
    * atomically switch to the new generation; a crashed rebuild leaves
    * the old one serving; prior batch AND delete ids stay refused
    * (folded ledger/tombledger records). Policy knob: rebuild when the
    * ingested-or-tombstoned fraction of the corpus is large enough that
    * the measured drift (or the tombstone anti-join) matters — e.g.
    * > 10–30% since the last (re)build (`CALL ann_stats` computes the
    * fraction and the flag).
    *
    * CONCURRENT-WRITER FENCE (r17): the ledger+tombledger name set is
    * snapshotted before the corpus read, re-listed immediately before
    * the COMMITTED create (a new entry → the new generation is missing
    * its data: the generation is deleted and the rebuild aborts loudly
    * — re-run it), and re-listed once more AFTER the create (an entry
    * that landed inside the commit window → the marker is rolled back,
    * the generation deleted, and the rebuild aborts — the old
    * generation, which HAS the entry, keeps serving). The symmetric
    * post-commit check in [[annIngest]]/[[annDelete]] self-revokes an
    * entry stranded in a dead generation — between the two sides, no
    * interleaving silently drops a committed batch or tombstone.
    *
    * Training knobs not recorded in the sidecars (`iters`, `seed`,
    * `trainFraction`, `opqIters`) are arguments; the structural shape
    * (variant, nlist, m, ksub, rank, residual, original dim) is
    * recovered from the serving generation itself. Returns the new
    * generation's path. */
  def annRebuild(spark: org.apache.spark.sql.SparkSession, dir: String,
      iters: Int = 2, seed: Long = 42L, trainFraction: Double = 1.0,
      opqIters: Int = 3): String = {
    val root = annRoot(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def entrySnapshot(): (Seq[String], Seq[String]) =
      (ledgerNames(fs, root, "ledger"), ledgerNames(fs, root, "tombledger"))
    val s1 = entrySnapshot()
    val idx = annLoad(spark, root)
    val roots = annDataRootsOf(spark, root)
      .filter(r => listCells(spark, r).nonEmpty)
    val stored = roots.map(r => spark.read.parquet(r)
        .select(col("corpus_id"), col("cv")))
      .reduce(_ unionByName _)
    // physical removal: tombstoned ids never enter the new generation
    val corpus = annTombstonesOf(spark, root)
      .fold(stored)(t => stored.join(broadcast(t), Seq("corpus_id"),
        "left_anti"))
    // structural shape recovered from the serving generation: original
    // dim from a stored vector, nlist/m/ksub from the sidecars
    val firstRow = corpus.select(size(col("cv"))).head(1)
    require(firstRow.nonEmpty,
      s"annRebuild($dir): every stored vector is tombstoned — an empty " +
        "retrain is meaningless; drop the index directory instead")
    val origDim = firstRow.head.getInt(0)
    val nlist = idx.cents.size
    val m = idx.books.size
    val ksub = idx.books.head.size
    val gp = new org.apache.hadoop.fs.Path(s"$dir/gen")
    val existing =
      if (!fs.exists(gp)) Seq.empty[String]
      else fs.listStatus(gp).map(_.getPath.getName).sorted.toSeq
    val next = existing.lastOption
      .map(_.stripPrefix("g").toInt + 1).getOrElse(1)
    val newGen = f"$dir/gen/g$next%05d"
    annIndexBuild(corpus, col("corpus_id"), col("cv"), newGen,
      dim = origDim, nlist = nlist, m = m, ksub = ksub, iters = iters,
      seed = seed, residual = idx.residual,
      trainFraction = trainFraction, variant = idx.variant,
      rank = if (idx.variant == "pca") idx.rdim else 0,
      opqIters = opqIters): Unit
    // carry the SNAPSHOTTED batch/delete ids as FOLDED records (no data
    // dir): a replayed id refuses after the rebuild too — batch rows are
    // in data/, tombstoned rows are physically gone
    s1._1.foreach(b => commitLedgerEntry(fs,
      new org.apache.hadoop.fs.Path(s"$newGen/ledger/$b.json"),
      s"""{"batch_id":"$b","n_rows":-1,"folded":true}\n"""))
    s1._2.foreach(t => commitLedgerEntry(fs,
      new org.apache.hadoop.fs.Path(s"$newGen/tombledger/$t.json"),
      s"""{"delete_id":"$t","n_ids":-1,"folded":true}\n"""))
    def abortConcurrent(phase: String): Nothing = {
      fs.delete(new org.apache.hadoop.fs.Path(newGen), true): Unit
      throw new IllegalStateException(
        s"annRebuild($dir) detected a concurrent ingest/delete commit " +
          s"$phase: its data is not in the retrained generation, so " +
          "the generation was discarded (the prior one keeps serving, " +
          "including the late entry) — re-run the rebuild")
    }
    annRebuildBeforeCommitHook(root)
    // fence (pre-commit): entries that appeared since the corpus read
    // are not in the new generation — abort, nothing committed
    if (entrySnapshot() != s1) abortConcurrent("before its marker")
    // one atomic create commits the generation
    fs.create(new org.apache.hadoop.fs.Path(newGen, "COMMITTED"), false)
      .close()
    // fence (post-commit): an entry that landed inside the commit window
    // was either self-revoked by its writer (who saw the new root — set
    // unchanged, we keep the commit) or is still present — roll the
    // marker back so the old generation (which serves it) stays current
    if (entrySnapshot() != s1) {
      fs.delete(new org.apache.hadoop.fs.Path(newGen, "COMMITTED"),
        false): Unit
      abortConcurrent("inside its commit window")
    }
    newGen
  }

  /** Encode an assigned-and-residualized frame against FIXED codebooks:
    * `(corpus_id, codes, vnorm, cv, __cluster)` — the stored row shape of
    * the compressed index (shared by the bulk write and [[ivfPqIngest]]). */
  private def pqEncodeFrame(encIn: DataFrame, books: PqCodebooks,
      dim: Int, m: Int): DataFrame = {
    val dsub = dim / m
    encIn
      .withColumn("codes", array((0 until m).map(s =>
        element_at(nearestL2(subCol(col("enc"), s, dsub), books(s), 1),
          1)): _*))
      .withColumn("vnorm", norm(col("cv"))) // TRUE norm, not the residual's
      .select("corpus_id", "codes", "vnorm", "cv", "__cluster")
  }

  /** INCREMENTAL ingest into an [[ivfPqWrite]] index: the new batch is
    * assigned and PQ-ENCODED against the FROZEN centroids and codebooks,
    * then appended to its cells' partitions — the compressed-index twin
    * of [[ivfIngest]] (FAISS `IndexIVFPQ.add`). `residual` must match the
    * build. Exactness: with nprobe = nlist and rerank ≥ corpus the grown
    * index is exactly brute force over the union (ADC only generates
    * candidates; the rerank reads the stored full vectors) — oracle-gated
    * `q_ivfpq_ingest_topk`. At realistic settings, codebooks trained
    * before the batch arrived quantize it slightly worse until the next
    * re-train — the same drift trade as the coarse centroids. */
  def ivfPqIngest(batch: DataFrame, id: Column, vec: Column, path: String,
      centroids: Seq[(Int, Seq[Float])], books: PqCodebooks,
      dim: Int, m: Int = 8, residual: Boolean = true,
      rotation: Option[Seq[Seq[Double]]] = None): Unit = {
    val base = batch.select(id.cast("long").as("corpus_id"), vec.as("cv"))
      .withColumn("v",
        rotation.fold(col("cv"))(r => toFloats(rotateCol(col("cv"), r))))
    val assigned = assignToCentroid(base, centroids)
    val encIn = assigned.withColumn("enc",
      residualCol(residual, centroids))
    pqEncodeFrame(encIn, books, dim, m)
      .write.mode("append").partitionBy("__cluster").parquet(path)
  }

  /** Approximate top-k against an [[ivfPqWrite]] index. Two phases:
    *
    *  1. ADC: scan ONLY the query batch's probe cells (driver-resolved
    *     static path list, like [[ivfTopKFromTable]]), reading ONLY
    *     (corpus_id, codes, vnorm) — column pruning keeps the vectors out
    *     of this scan entirely — and take the ADC-cosine top-`rerank` per
    *     query.
    *  2. rerank: join the candidate ids (broadcast — O(|q|·rerank) rows)
    *     back to the same cells for their FULL vectors and take the exact
    *     cosine top-k.
    *
    * `nprobe = nlist` with `rerank ≥ corpus` is EXACT ≡ bruteForceTopK
    * (the q_ivfpq_topk oracle gate); realistic settings trade recall for
    * the ~(nprobe/nlist)·(m/dim) scan fraction. Same output shape as the
    * other top-k paths. */
  def ivfPqTopKFromTable(spark: org.apache.spark.sql.SparkSession,
      path: String, centroids: Seq[(Int, Seq[Float])], books: PqCodebooks,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, dim: Int, nprobe: Int = 2, rerank: Int = 50,
      residual: Boolean = true,
      rotation: Option[Seq[Seq[Double]]] = None): DataFrame =
    ivfPqTopKFromRoots(spark, Seq(path), centroids, books, queries,
      queryId, queryVec, k, dim, nprobe, rerank, residual, rotation)

  /** [[ivfPqTopKFromTable]] over SEVERAL cell-partitioned roots — the
    * grown-index read shape: the build's `data/` plus every LEDGERED
    * ingest batch directory ([[annIngest]]). Each root contributes its
    * probed cells' files; roots missing a cell (a small batch that hit
    * few cells) simply contribute nothing there. */
  private def ivfPqTopKFromRoots(spark: org.apache.spark.sql.SparkSession,
      roots: Seq[String], centroids: Seq[(Int, Seq[Float])],
      books: PqCodebooks,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, dim: Int, nprobe: Int = 2, rerank: Int = 50,
      residual: Boolean = true,
      rotation: Option[Seq[Seq[Double]]] = None,
      exclude: Option[DataFrame] = None): DataFrame = {
    // residual decomposition: ⟨q, x̂⟩ = ⟨q, c_cell⟩ + ⟨q, r̂⟩ — the first
    // term is one dot per (query, probed cell) against the centroid
    // literal, the second the usual LUT sum over the codes. With an OPQ
    // `rotation` (must match the build), probing/LUT/qc run on the
    // ROTATED query while qnorm and the exact rerank stay on the
    // original (rotation preserves both).
    val centsD: Seq[Seq[Double]] =
      centroids.sortBy(_._1).map(_._2.map(_.toDouble))
    val qd = queries.select(queryId.cast("long").as("query_id"),
        queryVec.as("qv"))
      .withColumn("__rqv",
        rotation.fold(col("qv"))(r => toFloats(rotateCol(col("qv"), r))))
      .withColumn("__cluster",
        explode(probeClusters(centroids, nprobe)(col("__rqv"))))
      .withColumn("lut", pqLut(col("__rqv"), books, dim))
      .withColumn("qnorm", norm(col("qv")))
      .withColumn("qc",
        // native single-node kernel (CentroidQueryDot): the centroid
        // matrix is a stage reference object, not an O(nlist·dim)
        // analyzed array literal — bit-identical to the HOF form
        // ([[queryDotViaExprForm]], property-pinned)
        if (residual)
          graft.functions.CentroidOps.queryDot(col("__rqv"),
            col("__cluster"), centsD)
        else lit(0.0d))
      .drop("__rqv")
    // per-root cell inventory (driver-resolved static path lists); a
    // root missing a probed cell simply contributes nothing there
    val byRoot: Seq[(String, Set[Int])] =
      roots.map(r => r -> listCells(spark, r))
    val existing = byRoot.iterator.flatMap(_._2).toSet
    val cells = qd.select("__cluster").distinct()
      .collect().map(_.getInt(0)).toSeq.filter(existing)
    if (cells.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("corpus_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("cosine_micro",
            org.apache.spark.sql.types.LongType))))
    // tombstone anti-join (takedown-sized id set, broadcast) applied to
    // BOTH phases' scans: deleted rows neither rank as ADC candidates
    // (no stolen rerank slots) nor re-enter via the rerank's id join
    def cellScan() = {
      val scan = byRoot.flatMap { case (r, ex) =>
        val cs = cells.filter(ex)
        if (cs.isEmpty) None
        else Some(spark.read.option("basePath", r)
          .parquet(cs.map(c => s"$r/__cluster=$c"): _*))
      }.reduce(_ unionByName _)
      exclude.fold(scan)(t =>
        scan.join(broadcast(t.select(col("corpus_id"))),
          Seq("corpus_id"), "left_anti"))
    }
    // phase 1: compressed-domain scoring — vectors never enter this plan
    val adc = cellScan().select("corpus_id", "codes", "vnorm", "__cluster")
      .join(broadcast(qd), Seq("__cluster"))
      .withColumn("adc",
        when(col("qnorm") === 0.0d || col("vnorm") === 0.0d, lit(0.0d))
          .otherwise((col("qc") + adcDot(col("codes"), col("lut"))) /
            (col("qnorm") * col("vnorm"))))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("corpus_id").asc)
    val cand = adc.withColumn("__r", row_number().over(wAdc))
      .filter(col("__r") <= math.max(rerank, k))
      .select(col("query_id"), col("corpus_id"), col("qv"))
    // phase 2: exact rerank — only candidate rows' vectors are read
    val scored = cellScan().select(col("corpus_id"), col("cv"))
      .join(broadcast(cand), Seq("corpus_id"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val wCos = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= k)
      .withColumn("cosine_micro", floor(col("cos") * 1000000).cast("long"))
      .select("query_id", "corpus_id", "rank", "cosine_micro")
  }

  def ivfTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, nlist: Int, nprobe: Int = 2, seed: Long = 42L): DataFrame = {
    val centroids = ivfTrain(corpus, corpusId, corpusVec, nlist, seed = seed)
    val c = graft.util.ParallelScan.widen(
      corpus.select(corpusId.cast("long").as("corpus_id"), corpusVec.as("cv")))
    val cAssigned = assignToCentroid(c.withColumnRenamed("cv", "v"), centroids)
      .withColumnRenamed("v", "cv")
    val qd = queries.select(queryId.cast("long").as("query_id"),
        queryVec.as("qv"))
      .withColumn("__cluster",
        explode(probeClusters(centroids, nprobe)(col("qv"))))
    val scored = cAssigned.join(broadcast(qd), Seq("__cluster"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cosine_micro", floor(col("cos") * 1000000).cast("long"))
      .select("query_id", "corpus_id", "rank", "cosine_micro")
  }

  /** k-nearest-neighbor JOIN over one embedding table: for EVERY row, its
    * `k` nearest other rows by cosine (self excluded; ties by ascending
    * corpus id). Output (query_id, corpus_id, rank, cosine_micro) — the
    * kNN-graph builder behind clustering-based curation (SemDeDup-style
    * cluster mining, mutual-kNN components via [[mutualKnnEdges]]).
    *
    * The query side here is the WHOLE corpus, so the broadcast shape every
    * probe-sized top-k path above uses ([[bruteForceTopK]], [[ivfTopK]])
    * is structurally wrong at scale — you cannot broadcast 100 TB of
    * queries. This path instead shuffles BOTH sides by IVF cell:
    * corpus rows land in their nearest-centroid cell, query rows replicate
    * to their `nprobe` nearest cells, and the join is a plain shuffle
    * hash join on the cell id. Candidates per query = its probed cells'
    * occupancy (× nprobe cells), never all-pairs; Spark 4's
    * WindowGroupLimit bounds the per-query rank below the final exchange,
    * so only ≤ k candidate rows per (query, map partition) shuffle to the
    * rank stage. nprobe = nlist degenerates to exact brute force — the
    * oracle gate; realistic nprobe is recall-measured (RECALL_r12).
    *
    * Skew belt: a hot cell (near-duplicate pile-ups collapse many rows
    * onto one centroid — real embedding corpora have hub clusters) makes
    * that cell's task quadratic. Splits are PER CELL, derived from the
    * cell occupancy counts measured at assignment ([[cellSplitsOf]]):
    * cell c's CORPUS rows split into max(`cellSplits`,
    * ⌈|c| / targetCellRows⌉) sub-tasks by id hash, and each query row
    * replicates only over ITS probed cells' actual splits — the
    * replicated skew join, sized by the data instead of a hand-tuned
    * knob. `cellSplits` remains the uniform floor (1 = none);
    * `targetCellRows <= 0` disables the auto derivation. Result-identical
    * for any setting (spec-pinned); the SOAK `knn_join_skew` twin pins
    * the hub-cell task bound in both directions. */
  /** Auto cell-split default: at 100 TB a hub cell concentrates
    * |cell_corpus| × |cell_queries| pair work in one task; 2M build-side
    * rows per sub-task keeps the quadratic term bounded while staying
    * far above any local/test cell size (so small-scale plans are
    * byte-identical to the unsplit ones). */
  val DefaultTargetCellRows: Long = 2L << 20

  /** Occupancy-derived per-cell split counts (r16, the hot-key-armor
    * pattern applied to the ANN join): from the per-cell occupancy
    * estimate [[ivfTrainOcc]] measures on its ALREADY-PERSISTED train
    * sample (one cache-read pass — never an extra corpus scan; splits
    * shape load balance only, never results, so the trainFraction-scaled
    * estimate is safe and trainFraction = 1.0 is exact), split cell c
    * into ⌈|c| / target⌉ sub-cells, floored by the manual `cellSplits`.
    * Returns empty when auto is off or NO cell exceeds the floor — the
    * caller then plans the exact pre-r16 uniform shape. */
  private def cellSplitsOf(occ: Map[Int, Long], cellSplits: Int,
      target: Long): Map[Int, Int] = {
    if (target <= 0) return Map.empty
    val m = occ.map { case (c, n) =>
      c -> math.max(cellSplits,
        ((n + target - 1) / target).toInt)
    }
    if (m.values.forall(_ == cellSplits)) Map.empty else m
  }

  /** The split count of a row's `__cluster` as a literal-map lookup;
    * cells absent from the (sampled) occupancy map fall back to the
    * uniform floor. */
  private def splitsCol(splits: Map[Int, Int], cellSplits: Int): Column =
    if (splits.isEmpty) lit(cellSplits)
    else coalesce(element_at(typedLit(splits), col("__cluster")),
      lit(cellSplits))

  def knnJoin(ds: DataFrame, id: Column, vec: Column, k: Int,
      nlist: Int, nprobe: Int, iters: Int = 2, seed: Long = 42L,
      trainFraction: Double = 1.0, cellSplits: Int = 1,
      targetCellRows: Long = DefaultTargetCellRows): DataFrame = {
    require(cellSplits >= 1, s"cellSplits must be >= 1 (got $cellSplits)")
    val base = ds.select(id.cast("long").as("id"), vec.as("v"))
    val (centroids, occ) = ivfTrainOcc(base, col("id"), col("v"), nlist,
      iters, seed, trainFraction,
      withOccupancy = targetCellRows > 0)
    val probeN = math.min(nprobe, centroids.size)
    val splits = cellSplitsOf(occ, cellSplits, targetCellRows)
    val corpus = assignToCentroid(
        graft.util.ParallelScan.widen(base), centroids)
      .select(col("__cluster"),
        pmod(xxhash64(col("id")), splitsCol(splits, cellSplits))
          .cast("int").as("__s"),
        col("id").as("corpus_id"), col("v").as("cv"))
    val probes = graft.util.ParallelScan.widen(base)
      .withColumn("__cluster",
        explode(probeClusters(centroids, probeN)(col("v"))))
      .withColumn("__s",
        explode(sequence(lit(0),
          (splitsCol(splits, cellSplits) - 1).cast("int"))))
      .select(col("__cluster"), col("__s"),
        col("id").as("query_id"), col("v").as("qv"))
    // SHUFFLE_HASH pinned: the planner would otherwise sometimes broadcast
    // a (tiny-looking synthetic) side, scattering each query's candidates
    // across every streamed partition — the cell-keyed exchange both
    // bounds the build side per task and leaves the join output
    // cell-partitioned, so the top-k partial aggregate emits ≤ nprobe
    // buffers per query (measured 57 → 2 MB on the SOAK corpus).
    val scored = probes.join(corpus.hint("shuffle_hash"),
        Seq("__cluster", "__s"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    topKRanked(scored, col("cos"), k)
  }

  /** Per-query top-k rank over a candidate frame via the map-side-combined
    * [[graft.functions.TopKAgg]] — replaces the
    * `row_number() OVER (PARTITION BY query_id ...)` form on the kNN-JOIN
    * paths, where the query side is the whole corpus: the window's rank
    * exchange ships queries × k × #map-partitions rows even under
    * WindowGroupLimit (it dominated the join's own shuffle in SOAK_r13);
    * the aggregate combines to queries × k pairs total. Ordering
    * (score DESC, id ASC) is bit-identical to the window form
    * (spec-pinned). */
  private def topKRanked(scored: DataFrame, score: Column,
      k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKAgg.topK(score, col("corpus_id"), k)
        .as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__e")))
      .select(col("query_id"), col("__e.id").as("corpus_id"),
        (col("__p") + 1).cast("int").as("rank"),
        floor(col("__e.score") * 1000000).cast("long").as("cosine_micro"))

  /** COMPRESSED-DOMAIN kNN join — [[knnJoin]]'s cell-shuffle shape with
    * PQ codes flowing through the candidate join instead of the vectors
    * themselves. At 100 TB of embeddings the vectors ARE the data, and
    * [[knnJoin]] moves them (1 + nprobe)× through the cell exchange; here
    * BOTH sides of the big join carry (id, m one-byte codes, norm) — a
    * dim·4/m ≈ 32–256× row-size reduction — and full vectors enter the
    * plan only in the id-keyed exact-cosine rerank of each query's ADC
    * top-`rerank` candidates.
    *
    * Candidate scoring is SYMMETRIC distance computation (SDC — Jégou et
    * al. 2011 §III): both sides are quantized and scored via the
    * m·ksub² code-pair dot table `dot(books(s)(a), books(s)(b))`, a plan
    * literal. ADC (query-side LUT) would score more accurately but the
    * per-query LUT is m·ksub doubles — at production shapes (m 16,
    * ksub 256) that is ~8× the vector itself, exactly the payload this
    * operator exists to avoid shuffling; SDC's extra quantization error
    * only moves which candidates reach the exact rerank. Codebooks
    * quantize RAW vectors (no IVF residual): SDC under residuals needs a
    * per-CELL-PAIR cross-term table — nlist² of them — so the residual
    * refinement is structurally reserved for the query-broadcast paths
    * ([[ivfPqTopKFromTable]]).
    *
    * Cost accounting vs [[knnJoin]] (n rows, vectors of dim·4 bytes,
    * codes of ~m bytes): the cell exchange drops from (1+nprobe)·n·vec to
    * (1+nprobe)·n·codes. `rerank = 0` (the kNN-GRAPH BUILD mode, same
    * contract as [[pqTopK]]'s rerank=0) ranks purely by the SDC cosine
    * estimate — NO vector ever enters a shuffle, the full byte win;
    * `rerank > 0` adds two id-keyed joins moving 2·n·vec + n·rerank·vec
    * for exact-cosine verdicts on each query's SDC top-`rerank` — the
    * quality/bytes dial RECALL_r13 prices at both settings. Compute per
    * candidate drops from a dim-wide fused dot to m table lookups either
    * way.
    *
    * Exactness gate: nprobe = nlist makes every corpus row a candidate of
    * every query and rerank ≥ corpus lets them all through the ADC cut,
    * so the exact-cosine rerank reproduces brute force minus self
    * REGARDLESS of quantization quality (`q_knn_join_pq`'s oracle);
    * realistic (nprobe, rerank) recall is measured in RECALL_r13. With
    * rerank = 0, `cosine_micro` is the SDC ESTIMATE of the cosine
    * (approximate values, approximate ranking — candidates only).
    * `cellSplits`/`targetCellRows` are the same occupancy-derived
    * replicated skew belt as [[knnJoin]] (result-identical for any
    * setting).
    *
    * `opqIters` > 0 composes the OPQ rotation ([[opqTrain]], Ge et al.):
    * codebooks, codes and the SDC table live in ROTATED space while the
    * IVF cells, norms and the exact rerank stay on the original vectors
    * (rotation preserves dots and norms, so SDC approximates the SAME
    * cosine — only the quantization quality moves, at IDENTICAL exchange
    * bytes). The exactness gate is unchanged for any `opqIters`
    * (exhaustive probe + full rerank never depends on code quality,
    * spec-pinned); the realistic-dial lift is priced in RECALL_r14. */
  def knnJoinPq(ds: DataFrame, id: Column, vec: Column, k: Int,
      nlist: Int, nprobe: Int, dim: Int, m: Int = 8, ksub: Int = 256,
      iters: Int = 2, seed: Long = 42L, trainFraction: Double = 1.0,
      rerank: Int = 50, cellSplits: Int = 1,
      opqIters: Int = 0,
      targetCellRows: Long = DefaultTargetCellRows): DataFrame = {
    require(cellSplits >= 1, s"cellSplits must be >= 1 (got $cellSplits)")
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val dsub = dim / m
    val topR = math.max(rerank, k)
    val base = ds.select(id.cast("long").as("id"), vec.as("v"))
    // r17 (optimization, guide §2.6 — overlap independent jobs): IVF
    // training and codebook training read the same input but depend on
    // nothing of each other, yet ran strictly serially — every Lloyd
    // collect round-trip of one added dead time to the other. Both are
    // seeded-deterministic, so running them from two driver threads
    // changes nothing but the wall clock (the scheduler interleaves
    // their metadata-sized jobs; results are bit-identical).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val centsF = Future(ivfTrainOcc(base, col("id"), col("v"), nlist,
      iters, seed, trainFraction,
      withOccupancy = targetCellRows > 0))
    val booksF = Future(
      if (opqIters > 0) {
        val (r, b) = opqTrain(base, col("id"), col("v"), dim, m, ksub,
          iters, opqIters, seed, trainFraction)
        (Option(r), b)
      } else
        (None, pqTrain(base, col("id"), col("v"), dim, m, ksub, iters,
          seed, trainFraction)))
    val (centroids, occ) = Await.result(centsF, Duration.Inf)
    val (rotation, books) = Await.result(booksF, Duration.Inf)
    // the SDC table below strides by ksub — a short codebook (a sampled
    // training set with fewer rows than ksub in some subspace) would
    // otherwise surface as a bare IndexOutOfBoundsException from
    // books(s)(a)
    require(books.forall(_.size == ksub),
      s"PQ codebooks have ${books.map(_.size).distinct.mkString(",")} " +
        s"entries, expected ksub=$ksub: the (sampled) training set has " +
        "fewer rows than ksub — lower ksub or raise trainFraction")
    val probeN = math.min(nprobe, centroids.size)
    // the SDC table: sdc[s][a][b] = ⟨books(s)(a), books(s)(b)⟩, flattened
    // to one m·ksub² literal so per-pair scoring is m element_at lookups
    val sdcFlat: Seq[Double] =
      for (s <- 0 until m; a <- 0 until ksub; b <- 0 until ksub) yield {
        val (ca, cb) = (books(s)(a), books(s)(b))
        var acc = 0.0; var i = 0
        while (i < dsub) { acc += ca(i).toDouble * cb(i); i += 1 }
        acc
      }
    // one encode pass feeds both join sides AND the rerank's vector
    // fetches — persist so assignment + coding run once per row. Coding
    // reads the (possibly rotated) `rv`; cells, norms and the rerank stay
    // on the original `v` (‖x‖ = ‖R·x‖, rotateCol is applied ONCE per row
    // — the separate withColumn keeps the m code kernels referencing one
    // materialized column, not m inlined rotations).
    val coded = assignToCentroid(graft.util.ParallelScan.widen(base),
        centroids)
      .withColumn("rv",
        rotation.fold(col("v"))(r => toFloats(rotateCol(col("v"), r))))
      .withColumn("codes", array((0 until m).map(s =>
        element_at(nearestL2(subCol(col("rv"), s, dsub), books(s), 1),
          1)): _*))
      .withColumn("vnorm", norm(col("v")))
      .drop("rv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // occupancy-derived per-cell splits (shared with [[knnJoin]]) —
      // the hub-cell belt, sized by the data
      val splits = cellSplitsOf(occ, cellSplits, targetCellRows)
      val corpus = coded.select(col("__cluster"),
        pmod(xxhash64(col("id")), splitsCol(splits, cellSplits))
          .cast("int").as("__s"),
        col("id").as("corpus_id"), col("codes").as("ccodes"),
        col("vnorm").as("cnorm"))
      val probes = coded
        .withColumn("__cluster",
          explode(probeClusters(centroids, probeN)(col("v"))))
        .withColumn("__s", explode(sequence(lit(0),
          (splitsCol(splits, cellSplits) - 1).cast("int"))))
        .select(col("__cluster"), col("__s"), col("id").as("query_id"),
          col("vnorm").as("qnorm"), col("codes").as("qcodes"))
      // native gather kernel — the HOF form (aggregate + zip_with over a
      // table literal) evaluates interpreted with per-PAIR allocations and
      // made the compressed join 5× slower than the full-vector one
      val sdcDot = graft.functions.SdcDot.sdcDot(col("qcodes"),
        col("ccodes"), sdcFlat, ksub)
      // SHUFFLE_HASH pinned for the same reason as [[knnJoin]]: the
      // cell-keyed exchange IS the advertised byte win (codes, never
      // vectors) and keeps the join output cell-partitioned for the
      // top-k partial aggregate
      val scored = probes.join(corpus.hint("shuffle_hash"),
          Seq("__cluster", "__s"))
        .filter(col("query_id") =!= col("corpus_id"))
        .withColumn("adc",
          when(col("qnorm") * col("cnorm") === 0.0d, lit(0.0d))
            .otherwise(sdcDot / (col("qnorm") * col("cnorm"))))
      val out =
        if (rerank <= 0)
          // graph-build mode: SDC ranking is the verdict; no vector ever
          // shuffles (cosine_micro = the SDC cosine estimate)
          topKRanked(scored, col("adc"), k)
        else {
          // candidate cut: the aggregate buffers up to topR pairs per
          // query in memory, so the huge-topR exhaustive gate keeps the
          // spill-friendly window form (WindowGroupLimit still prunes)
          val cand =
            if (topR <= 65536)
              topKRanked(scored, col("adc"), topR)
                .select("query_id", "corpus_id")
            else {
              val wAdc = Window.partitionBy("query_id")
                .orderBy(col("adc").desc, col("corpus_id").asc)
              scored.withColumn("__r", row_number().over(wAdc))
                .filter(col("__r") <= topR)
                .select("query_id", "corpus_id")
            }
          // exact rerank: candidate ids fetch each side's vector by an
          // id-keyed join — the ONLY plan full vectors flow through
          val rescored = cand
            .join(coded.select(col("id").as("corpus_id"),
              col("v").as("cv")), Seq("corpus_id"))
            .join(coded.select(col("id").as("query_id"),
              col("v").as("qv")), Seq("query_id"))
            .withColumn("cos", cosine(col("qv"), col("cv")))
          topKRanked(rescored, col("cos"), k)
        }
      // materialize before releasing the cache — the caller's action
      // would otherwise re-run assignment + coding per consumer
      graft.util.PlanProbe.record("knnJoinPq", out)
      out.localCheckpoint(true)
    } finally coded.unpersist(blocking = false)
  }

  /** Mutual-kNN edges from a [[knnJoin]] result: (id_a, id_b) with
    * id_a < id_b, kept iff each endpoint is in the other's top-k — the
    * standard symmetrization that makes kNN graphs cluster-able (one-way
    * edges from hubs are what smear unrelated clusters together).
    *
    * r17 (optimization): ONE canonical-orientation aggregate instead of
    * `fwd.intersect(rev)`. The intersect referenced `knn` twice — and the
    * planner evaluates each reference as its own subtree, so an
    * UNMATERIALIZED knnJoin upstream (the composed q_knn_clusters path)
    * ran the whole cell join TWICE — and then paid intersect's two-sided
    * distinct aggregates plus the semi join. Here each (q,c) row folds to
    * its canonical (min,max) orientation with a direction flag; a pair is
    * mutual iff BOTH directions were observed — one map-side-combined
    * exchange, `knn` referenced once. Result-identical to the intersect
    * form (knnJoin never emits self-pairs, and its (query, corpus) rows
    * are distinct by construction; property-pinned in PipelineSpec). */
  def mutualKnnEdges(knn: DataFrame): DataFrame =
    knn.select(
        least(col("query_id"), col("corpus_id")).as("id_a"),
        greatest(col("query_id"), col("corpus_id")).as("id_b"),
        (col("query_id") < col("corpus_id")).as("__fwd"))
      .groupBy("id_a", "id_b")
      .agg(max(when(col("__fwd"), 1).otherwise(0)).as("__f"),
        max(when(!col("__fwd"), 1).otherwise(0)).as("__r"))
      .filter(col("__f") === 1 && col("__r") === 1)
      .select(col("id_a"), col("id_b"))
}
