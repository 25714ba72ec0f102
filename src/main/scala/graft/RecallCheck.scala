package graft

import graft.pipeline.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall gate for every APPROXIMATE retrieval path, at an arbitrary scale
  * factor (the per-round artifact runs it at the bench SF, sf0.1 —
  * RECALL_r{N}.json). Exact-by-construction paths (PPJoin prefix, winnow
  * prefix, simhash pigeonhole buckets) are property-pinned in CI instead;
  * this tool measures the paths whose recall is a DATA property:
  *
  *  - MinHash-LSH pairs vs the brute-force inverted-index Jaccard —
  *    target recall 1.0 at the shipped banding (the precondition for
  *    q_minhash_pairs' brute-force oracle);
  *  - embedding near-dup blocking vs exact all-pairs — precision must be
  *    1.0 (blocked ⊆ exact); recall is reported (sign-LSH blocking is part
  *    of the shipped semantics and its oracle);
  *  - hyperplane-LSH top-k vs brute-force top-k — recall@k reported,
  *    < 1 by design (tuned by `planes`);
  *  - IVF top-k at LOW nprobe vs brute force — recall@k reported, < 1 by
  *    design (tuned by `nprobe`/`nlist`; nprobe = nlist is exact and
  *    oracle-gated as q_ivf_topk).
  *
  * Usage: runMain graft.RecallCheck [sfDir] [outJsonFile]
  * Prints one JSON line; also writes it to outJsonFile when given.
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = args.drop(1).headOption
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {

    // -- MinHash-LSH pairs vs brute force (target: recall exactly 1) --
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lsh = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      n = 3, numHashes = 32, bands = 16, thresholdPermille = 500)
    val brutePairs = Dedup.ngramJaccardPairsFullIndex(docs, col("doc_id"),
      col("text"), blocking = lit(1), n = 3, thresholdPermille = 500)
    val nTrue = brutePairs.count()
    val missed = brutePairs.exceptAll(lsh).count()
    val extra = lsh.exceptAll(brutePairs).count()
    val minhashRecall =
      if (nTrue == 0) 1.0 else (nTrue - missed).toDouble / nTrue

    // -- Embedding near-dup blocking (precision must be 1; recall data) --
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val blocked = Dedup.embeddingNearDupPairs(embs, col("vec_id"),
      col("embedding"), thresholdNum = 2, thresholdDen = 5)
    val allPairs = Dedup.embeddingNearDupPairsAllPairs(embs, col("vec_id"),
      col("embedding"), thresholdNum = 2, thresholdDen = 5)
    val nExact = allPairs.count()
    val falsePos = blocked.exceptAll(allPairs).count()
    val embMissed = allPairs.exceptAll(blocked).count()
    val embRecall =
      if (nExact == 0) 1.0 else (nExact - embMissed).toDouble / nExact
    // high-recall mode: 32 seeded bands + multi-probe (q_embed_neardup_hi)
    val blockedHi = Dedup.embeddingNearDupPairs(embs, col("vec_id"),
      col("embedding"), thresholdNum = 2, thresholdDen = 5,
      bandCoords = Some(Dedup.signBandCoords(32, 8, 64, 7L)),
      multiProbe = true)
    val hiFalsePos = blockedHi.exceptAll(allPairs).count()
    val hiMissed = allPairs.exceptAll(blockedHi).count()
    val hiRecall =
      if (nExact == 0) 1.0 else (nExact - hiMissed).toDouble / nExact

    // -- top-k paths: recall@k over a query batch vs brute force --
    val k = 5
    val queries = embs.filter(col("vec_id") < 50)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("corpus_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteTop = pairSet(Similarity.bruteForceTopK(
      embs, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k))
    val lshTop = pairSet(Similarity.lshTopK(
      embs, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k, dim = 64, planes = 6))
    // empty brute-force top set (no queries at this SF) => vacuous recall 1
    val lshTopkRecall = if (bruteTop.isEmpty) 1.0
      else (bruteTop & lshTop).size.toDouble / bruteTop.size
    // IVF recall-vs-nprobe sweep (r8): the cost/recall knob measured at
    // nprobe ∈ {1, nlist/2, nlist} — nlist must be EXACTLY 1.0 (the
    // q_ivf_topk exactness precondition), the low settings are the
    // serving trade-off a user tunes.
    val nlist = 8
    def ivfRecallAt(nprobe: Int): Double = {
      val ivfTop = pairSet(Similarity.ivfTopK(
        embs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k, nlist = nlist,
        nprobe = nprobe))
      if (bruteTop.isEmpty) 1.0
      else (bruteTop & ivfTop).size.toDouble / bruteTop.size
    }
    val ivfR1 = ivfRecallAt(1)
    val ivfR4 = ivfRecallAt(nlist / 2)
    val ivfRFull = ivfRecallAt(nlist)

    // r10 tail: INGEST drift at the realistic nprobe — the same corpus
    // served from an index whose centroids were frozen BEFORE a third of
    // it arrived (ivfIngest), vs the fully-retrained sweep above. The gap
    // ivfR4 − ivfIngestR4 is the measured price of deferring a retrain.
    val ivfIngestR4 = {
      val dir = "/tmp/graft_recall/ivf_ingest"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      val id = col("vec_id"); val v = col("embedding")
      val cents = Similarity.ivfWrite(
        embs.filter(id % 3 =!= 2), id, v, dir, nlist = nlist)
      Similarity.ivfIngest(embs.filter(id % 3 === 2), id, v, dir, cents)
      val top = pairSet(Similarity.ivfTopKFromTable(spark, dir, cents,
        queries, id, v, k, nprobe = nlist / 2))
      if (bruteTop.isEmpty) 1.0
      else (bruteTop & top).size.toDouble / bruteTop.size
    }

    // PQ recall (r8): pure compressed-domain ADC ranking, and the
    // realistic small-multiple rerank (4k candidates re-scored exactly);
    // rerank ≥ corpus is exact and oracle-gated as q_pq_topk.
    def pqRecallAt(rerank: Int): Double = {
      val pqTop = pairSet(Similarity.pqTopK(
        embs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k, dim = 64, m = 8,
        ksub = 16, rerank = rerank))
      if (bruteTop.isEmpty) 1.0
      else (bruteTop & pqTop).size.toDouble / bruteTop.size
    }
    val pqAdcRecall = pqRecallAt(0)
    val pqRerankRecall = pqRecallAt(4 * k)
    // r9: codebooks trained on a 25% hash-sample (the 100 TB default) —
    // quantifies the recall cost of sampled training at the same rerank
    val pqSampledRecall = {
      val top = pairSet(Similarity.pqTopK(
        embs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k, dim = 64, m = 8,
        ksub = 16, rerank = 4 * k, trainFraction = 0.25))
      if (bruteTop.isEmpty) 1.0
      else (bruteTop & top).size.toDouble / bruteTop.size
    }

    // OPQ (r9): learned-rotation PQ at the same serving cost — the
    // recall lift the rotation buys, pure-ADC and at the realistic rerank
    def opqRecallAt(rerank: Int): Double = {
      val top = pairSet(Similarity.opqTopK(
        embs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k, dim = 64, m = 8,
        ksub = 16, rerank = rerank, opqIters = 3))
      if (bruteTop.isEmpty) 1.0
      else (bruteTop & top).size.toDouble / bruteTop.size
    }
    val opqAdcRecall = opqRecallAt(0)
    val opqRerankRecall = opqRecallAt(4 * k)

    // PCA (r14): subspace-cosine candidates at rank < dim — recall priced
    // by (rank, rerank); full rerank is exact regardless of rank (the
    // q_pca_topk gate), so only realistic settings are measured here.
    def pcaRecallAt(rank: Int, rerank: Int): Double = {
      val top = pairSet(Similarity.pcaTopK(
        embs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k, dim = 64,
        rank = rank, center = false, rerank = rerank))
      if (bruteTop.isEmpty) 1.0
      else (bruteTop & top).size.toDouble / bruteTop.size
    }
    val pcaR8 = pcaRecallAt(8, 0)
    val pcaR16 = pcaRecallAt(16, 0)
    val pcaR32 = pcaRecallAt(32, 0)
    val pcaR16Rerank = pcaRecallAt(16, 4 * k)

    // IVF-PQ composed serving path (r8): realistic nprobe + rerank, and
    // the exhaustive setting that must reproduce brute force exactly.
    // Each index is built ONCE per quantization mode; nprobe/rerank are
    // pure read-path knobs probed against the same index.
    def ivfpqIndex(residual: Boolean)
        : (Int, Int) => Double = {
      // per-RUN temp dir (not a fixed /tmp path): concurrent RecallCheck
      // runs must not overwrite each other's index mid-measurement, and
      // the JVM exit hook reclaims it
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_recall_ivfpq_$residual")
        .toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir))))
      val (pqCents, pqBooks) = Similarity.ivfPqWrite(embs, col("vec_id"),
        col("embedding"), dir, dim = 64, nlist = nlist,
        residual = residual)
      (nprobe: Int, rerank: Int) => {
        val top = pairSet(Similarity.ivfPqTopKFromTable(spark, dir,
          pqCents, pqBooks, queries, col("vec_id"), col("embedding"), k,
          dim = 64, nprobe = nprobe, rerank = rerank,
          residual = residual))
        if (bruteTop.isEmpty) 1.0
        else (bruteTop & top).size.toDouble / bruteTop.size
      }
    }
    // residual quantization (the shipped default) vs raw-vector PQ at the
    // same code budget — the recall lift residual encoding buys
    val ivfpqRes = ivfpqIndex(residual = true)
    val ivfpqRealistic = ivfpqRes(nlist / 2, 4 * k)
    val ivfpqRaw = ivfpqIndex(residual = false)(nlist / 2, 4 * k)
    val ivfpqExact = ivfpqRes(nlist, 1 << 30)
    // r9 Pareto sweep over the SAME residual index: (nprobe, rerank) →
    // recall, mapping the knob space a deployment tunes (read cost grows
    // ~linearly in nprobe and in rerank; recall is what it buys)
    val paretoProbes = Seq(1, math.max(1, nlist / 4), nlist / 2, nlist)
      .distinct
    val paretoReranks = Seq(k, 4 * k, 16 * k)
    val pareto = for (np <- paretoProbes; rr <- paretoReranks)
      yield (np, rr, ivfpqRes(np, rr))

    // IVF-OPQ (r11): the full OPQ+IVF+PQ composition at the same knobs —
    // the recall delta the learned rotation buys at identical serving
    // cost (exhaustive gate is q_ivfopq_topk's oracle)
    val ivfopqRealistic = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_recall_ivfopq").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir))))
      val (rot, oc, ob) = Similarity.ivfOpqWrite(embs, col("vec_id"),
        col("embedding"), dir, dim = 64, nlist = nlist)
      val top = pairSet(Similarity.ivfPqTopKFromTable(spark, dir, oc, ob,
        queries, col("vec_id"), col("embedding"), k, dim = 64,
        nprobe = nlist / 2, rerank = 4 * k, rotation = Some(rot)))
      if (bruteTop.isEmpty) 1.0
      else (bruteTop & top).size.toDouble / bruteTop.size
    }

    // IVF-PCA (r14): the PCAR16,IVF,PQ chain at the same knobs — what the
    // 4× training/probe FLOP cut (rank 16 of dim 64) costs in recall vs
    // the full-dim index (exhaustive gate is q_ivfpca_topk's oracle)
    val ivfpcaRealistic = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_recall_ivfpca").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir))))
      val (rot, pc, pb) = Similarity.ivfPcaWrite(embs, col("vec_id"),
        col("embedding"), dir, dim = 64, rank = 16, nlist = nlist)
      val top = pairSet(Similarity.ivfPqTopKFromTable(spark, dir, pc, pb,
        queries, col("vec_id"), col("embedding"), k, dim = 16,
        nprobe = nlist / 2, rerank = 4 * k, rotation = Some(rot)))
      if (bruteTop.isEmpty) 1.0
      else (bruteTop & top).size.toDouble / bruteTop.size
    }

    // .ann ingest drift (r15): the sidecar index built on 2/3 of the
    // corpus (pca variant), the last third APPENDED through the frozen
    // sidecars (annIngest) — recall at the same knobs vs the full-corpus
    // build (recall_ivfpca_rank16_same_setting) prices the "model
    // trained before the batch arrived" drift annIngest's scaladoc
    // references. Exhaustive settings stay exact either way (the
    // q_ann_ingest_topk gate), so only realistic knobs are measured.
    val (annIngestDrift, annRebuilt, annDeleteUndeleted) = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_recall_anningest").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir))))
      val id = col("vec_id"); val v = col("embedding")
      Similarity.annIndexBuild(embs.filter(id % 3 =!= 2), id, v, dir,
        dim = 64, nlist = nlist, variant = "pca", rank = 16): Unit
      Similarity.annIngest(spark, dir, embs.filter(id % 3 === 2), id, v,
        "recall-b1"): Unit
      def recallVs(ref: Set[(Long, Long)]): Double = {
        val top = pairSet(Similarity.annTopK(spark, dir, queries, id, v,
          k, nprobe = nlist / 2, rerank = 4 * k))
        if (ref.isEmpty) 1.0
        else (ref & top).size.toDouble / ref.size
      }
      val drift = recallVs(bruteTop)
      // the drift-recovery verb (r16): retrain over the grown corpus
      // from the index's own stored vectors, atomic generation swap —
      // recall at the same knobs must recover to the retrained row
      Similarity.annRebuild(spark, dir): Unit
      val rebuilt = recallVs(bruteTop)
      // takedown (r17): tombstone a slice, then measure recall for the
      // UNDELETED rows — vs brute force over corpus-minus-deleted —
      // at the same knobs. The anti-join must not degrade what
      // remains (the row should sit at the rebuilt level).
      Similarity.annDelete(spark, dir, embs.filter(id % 11 === 0), id,
        "recall-td1"): Unit
      val live = embs.filter(id % 11 =!= 0)
      val bruteLive = pairSet(Similarity.bruteForceTopK(live, id, v,
        queries, id, v, k))
      (drift, rebuilt, recallVs(bruteLive))
    }

    // kNN JOIN (r12): whole-corpus query side (no broadcast anywhere) —
    // recall of the realistic-nprobe cell join vs the exact nprobe = nlist
    // join (which PipelineSpec pins ≡ brute force), plus the mutual-edge
    // yield the kNN-graph clustering actually consumes.
    val knnK = 3
    def knnAt(nprobe: Int) = Similarity.knnJoin(embs, col("vec_id"),
      col("embedding"), k = knnK, nlist = nlist, nprobe = nprobe)
    val knnExactDf = knnAt(nlist)
    val knnExact = pairSet(knnExactDf)
    def knnRecallAt(nprobe: Int): Double = {
      val s = pairSet(knnAt(nprobe))
      if (knnExact.isEmpty) 1.0
      else (knnExact & s).size.toDouble / knnExact.size
    }
    val knnR1 = knnRecallAt(1)
    val knnR4 = knnRecallAt(nlist / 2)
    val knnMutual = Similarity.mutualKnnEdges(knnExactDf).count()

    // Compressed-domain kNN join (r13): the same exact reference set;
    // realistic (nprobe, rerank) measures what SDC candidate generation
    // plus the bounded exact rerank lose vs the full-vector cell join at
    // the SAME nprobe — the recall price of never shuffling vectors
    // through the big join.
    def knnPqRecall(nprobe: Int, rr: Int, opqIters: Int = 0): Double = {
      val s = pairSet(Similarity.knnJoinPq(embs, col("vec_id"),
        col("embedding"), k = knnK, nlist = nlist, nprobe = nprobe,
        dim = 64, rerank = rr, opqIters = opqIters))
      if (knnExact.isEmpty) 1.0
      else (knnExact & s).size.toDouble / knnExact.size
    }
    val knnPqR0 = knnPqRecall(nlist / 2, 0) // graph-build mode: SDC only
    val knnPqR = knnPqRecall(nlist / 2, 4 * knnK)
    val knnPqRHi = knnPqRecall(nlist / 2, 12 * knnK)
    // OPQ-composed (r14): same settings, same exchange bytes — the rows
    // price what the rotation buys the SDC candidate generation
    val knnOpqR0 = knnPqRecall(nlist / 2, 0, opqIters = 3)
    val knnOpqR = knnPqRecall(nlist / 2, 4 * knnK, opqIters = 3)
    val knnOpqRHi = knnPqRecall(nlist / 2, 12 * knnK, opqIters = 3)

    // SemDeDup (r10): not a recall metric — the kept set is oracle-exact
    // by construction (q_sem_dedup); report the operational shape at the
    // bench SF: corpus size, survivors, and how many of the 32 seeded
    // anchor cells the keeps span (the occupancy knob's effect).
    val semKeep = Dedup.semDedupKeep(embs, col("vec_id"), col("embedding"),
      Dedup.rademacherAnchors(32, 64, 11L),
      thresholdNum = 2, thresholdDen = 5)
    val semTotal = embs.count()
    val semKept = semKeep.count()
    val semCells = semKeep.select("cl").distinct().count()

    val minhashOk = missed == 0 && extra == 0
    val embOk = falsePos == 0
    val json =
      s"""{"sf":"$sfDir",""" +
      s""""minhash_pairs":{"true":$nTrue,"lsh":${nTrue - missed + extra},""" +
      s""""missed":$missed,"extra":$extra,"recall":$minhashRecall,""" +
      s""""target":"recall == 1.0 (brute-force-oracle precondition)","pass":$minhashOk},""" +
      s""""embed_neardup":{"exact":$nExact,"blocked":${nExact - embMissed + falsePos},""" +
      s""""false_positives":$falsePos,"recall":$embRecall,""" +
      s""""target":"precision == 1.0 (blocked is subset of exact); recall is the shipped blocking contract","pass":$embOk},""" +
      s""""embed_neardup_hi":{"exact":$nExact,"blocked":${nExact - hiMissed + hiFalsePos},""" +
      s""""false_positives":$hiFalsePos,"recall":$hiRecall,""" +
      s""""target":"32 seeded bands + multi-probe (lowest-margin flip): recall >= 0.8 at precision 1.0","pass":${hiFalsePos == 0 && hiRecall >= 0.8}},""" +
      s""""lsh_topk":{"k":$k,"planes":6,"recall_at_k":$lshTopkRecall,""" +
      s""""target":"< 1 by design, tuned by planes"},""" +
      s""""ivf_topk":{"k":$k,"nlist":$nlist,""" +
      s""""recall_at_k_by_nprobe":{"1":$ivfR1,"${nlist / 2}":$ivfR4,"$nlist":$ivfRFull},""" +
      s""""recall_at_k_nprobe${nlist / 2}_after_ingest_third":$ivfIngestR4,""" +
      s""""target":"< 1 by design at low nprobe; nprobe == nlist must be exactly 1.0 (q_ivf_topk); ingest row measures frozen-centroid drift vs the retrained $ivfR4","pass":${ivfRFull == 1.0}},""" +
      s""""pq_topk":{"k":$k,"m":8,"ksub":16,"recall_at_k_adc":$pqAdcRecall,""" +
      s""""recall_at_k_rerank${4 * k}":$pqRerankRecall,""" +
      s""""recall_sampled_train_0.25_rerank${4 * k}":$pqSampledRecall,""" +
      s""""recall_opq_adc":$opqAdcRecall,""" +
      s""""recall_opq_rerank${4 * k}":$opqRerankRecall,""" +
      s""""target":"ADC < 1 by design; rerank >= corpus is exact (q_pq_topk); rerank must not lose recall vs pure ADC","pass":${pqRerankRecall >= pqAdcRecall}},""" +
      s""""pca_topk":{"k":$k,"dim":64,""" +
      s""""recall_at_k_by_rank":{"8":$pcaR8,"16":$pcaR16,"32":$pcaR32},""" +
      s""""recall_rank16_rerank${4 * k}":$pcaR16Rerank,""" +
      s""""target":"< 1 by design at rank < dim; full rerank is exact (q_pca_topk); rerank must not lose recall vs pure subspace","pass":${pcaR16Rerank >= pcaR16}},""" +
      s""""ivfpq_topk":{"k":$k,"nlist":$nlist,""" +
      s""""recall_at_k_nprobe${nlist / 2}_rerank${4 * k}":$ivfpqRealistic,""" +
      s""""recall_raw_pq_same_setting":$ivfpqRaw,""" +
      s""""recall_ivfopq_same_setting":$ivfopqRealistic,""" +
      s""""recall_ivfpca_rank16_same_setting":$ivfpcaRealistic,""" +
      s""""recall_ann_ingest_grown_same_setting":$annIngestDrift,""" +
      s""""recall_ann_rebuild_same_setting":$annRebuilt,""" +
      s""""recall_ann_delete_undeleted_same_setting":$annDeleteUndeleted,""" +
      s""""recall_at_k_exhaustive":$ivfpqExact,""" +
      s""""pareto":[""" + pareto.map { case (np, rr, r) =>
        s"""{"nprobe":$np,"rerank":$rr,"recall":$r}""" }.mkString(",") +
      s"""],""" +
      s""""target":"exhaustive (nprobe=nlist, full rerank) must be exactly 1.0 (q_ivfpq_topk)","pass":${ivfpqExact == 1.0}},""" +
      s""""knn_join":{"k":$knnK,"nlist":$nlist,""" +
      s""""recall_by_nprobe":{"1":$knnR1,"${nlist / 2}":$knnR4},""" +
      s""""mutual_edges_at_exact":$knnMutual,""" +
      s""""target":"< 1 by design at low nprobe; nprobe == nlist is spec-pinned exact (PipelineSpec) and oracle-gated (q_knn_join)"},""" +
      s""""knn_join_pq":{"k":$knnK,"nlist":$nlist,"m":8,"ksub":256,""" +
      s""""recall_nprobe${nlist / 2}_rerank0_sdc_only":$knnPqR0,""" +
      s""""recall_nprobe${nlist / 2}_rerank${4 * knnK}":$knnPqR,""" +
      s""""recall_nprobe${nlist / 2}_rerank${12 * knnK}":$knnPqRHi,""" +
      s""""full_vector_same_nprobe":$knnR4,""" +
      s""""opq_recall_nprobe${nlist / 2}_rerank0_sdc_only":$knnOpqR0,""" +
      s""""opq_recall_nprobe${nlist / 2}_rerank${4 * knnK}":$knnOpqR,""" +
      s""""opq_recall_nprobe${nlist / 2}_rerank${12 * knnK}":$knnOpqRHi,""" +
      s""""target":"exhaustive probe + full rerank is spec-pinned exact (PipelineSpec) and oracle-gated (q_knn_join_pq/q_knn_join_opq); realistic rows price the codes-only join; opq rows the rotation's lift at identical bytes"},""" +
      s""""sem_dedup":{"anchors":32,"total":$semTotal,"kept":$semKept,""" +
      s""""cells_used":$semCells,""" +
      s""""target":"kept set oracle-exact by construction (q_sem_dedup); operational shape only","pass":${semKept > 0}}}"""
    println(json)
    outFile.foreach(f => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(f), json + "\n"))
    require(minhashOk, s"minhash recall gate failed: missed=$missed extra=$extra")
    require(embOk, s"embed blocking emitted $falsePos false positives")
    require(hiFalsePos == 0,
      s"hi-recall embed blocking emitted $hiFalsePos false positives")
    require(ivfRFull == 1.0,
      s"IVF at nprobe == nlist must be exact, recall was $ivfRFull")
    require(pqRerankRecall >= pqAdcRecall,
      s"PQ rerank recall $pqRerankRecall < pure-ADC recall $pqAdcRecall")
    require(ivfpqExact == 1.0,
      s"exhaustive IVF-PQ must be exact, recall was $ivfpqExact")
    } finally spark.stop() // gates may throw: never leave the session running
  }
}
