package graft

import graft.pipeline.TextRetrieval
import org.apache.spark.sql.functions._

/** BM25 inverted-index retrieval: partition-pruned query path, fp scorer
  * against an independent composition, batch ≡ single, df capping. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val idx = Fixtures.textIndexDir(spark, sf0001)

  test("search reads only the query terms' buckets (partition pruning)") {
    val terms = Seq("spark", "join")
    val buckets = terms.map(TextRetrieval.termBucket(_, 16)).distinct.toSet
    val df = TextRetrieval.exactTopK(spark, idx, terms, k = 10)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("/postings")) => s
    }
    // r11: the MaxScore candidate pass adds a second (narrow) postings
    // scan — EVERY postings scan must stay bucket-pruned
    assert(scans.nonEmpty, "expected at least one postings scan")
    for (scan <- scans) {
      assert(scan.partitionFilters.nonEmpty,
        "tb predicate did not reach the scan as a partitionFilter")
      val pruned = scan.relation.location
        .listFiles(scan.partitionFilters, Nil)
        .flatMap(_.files.map(_.getPath.toString))
      val touched = pruned.flatMap(f =>
        "tb=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt)).toSet
      assert(touched.nonEmpty && touched.subsetOf(buckets),
        s"scan listed buckets $touched, query needs only $buckets")
      // and the index holds more buckets than the query touched
      val all = scan.relation.location.inputFiles
        .flatMap(f =>
          "tb=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
        .toSet
      assert(touched.size < all.size,
        s"no pruning: touched ${touched.size} of ${all.size} buckets")
    }
  }

  test("fp bm25TopK matches an independently-composed scorer (tolerance)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val terms = Seq("spark", "join", "window")
    val got = TextRetrieval.bm25TopK(spark, idx, terms, k = 10)
      .as[(Long, Double)].collect().toSeq

    // reference: same math straight over the corpus, no index
    val tok = docs.select($"doc_id",
      explode(split(trim(lower($"text")), "\\s+")).as("term"))
    val post = tok.groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val dfr = post.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.count().toDouble
    val avgdl = tok.count().toDouble / n
    val want = post.join(dl, "doc_id").join(dfr, "term")
      .where($"term".isin(terms: _*))
      .withColumn("tscore",
        log(lit(1.0) + (lit(n) - $"df" + lit(0.5)) / ($"df" + lit(0.5))) *
          ($"tf" * lit(2.2)) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / lit(avgdl))))
      .groupBy($"doc_id").agg(sum($"tscore").as("score"))
      .orderBy($"score".desc, $"doc_id".asc).limit(10)
      .as[(Long, Double)].collect().toSeq

    assert(got.map(_._1) == want.map(_._1), "ranking differs")
    got.zip(want).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(math.abs(b), 1.0))
    }
  }

  test("batch scorer with one query equals the single-query scorer") {
    val terms = Seq("spark", "window")
    val single = TextRetrieval.exactTopK(spark, idx, terms, k = 8)
      .as[(Long, Long)].collect().toSeq
    val q = terms.map(t => (7L, t)).toDF("qid", "term")
    val batch = TextRetrieval.exactTopKBatch(spark, idx, q, k = 8)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toSeq
    assert(batch == single)
  }

  test("maintained index: ingest batches converge to the batch index; " +
    "remove updates df/stats exactly; postings read is partition-pruned") {
    val dir = freshDir("text_inc_idx")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(120)
    val id = col("doc_id"); val tx = col("text")
    val terms = Seq("spark", "join", "window")

    // two ingest batches == one batch build over the union
    TextRetrieval.incIngest(spark, dir, docs.filter(id % 2 === 0), id, tx)
    TextRetrieval.incIngest(spark, dir, docs.filter(id % 2 === 1), id, tx)
    val batchDir = freshDir("text_inc_idx_batch")
    TextRetrieval.buildIndex(spark, docs, id, tx, batchDir)
    val inc = TextRetrieval.incExactTopK(spark, dir, terms, k = 15)
      .as[(Long, Long)].collect().toSeq
    val full = TextRetrieval.exactTopK(spark, batchDir, terms, k = 15)
      .as[(Long, Long)].collect().toSeq
    assert(inc == full)

    // remove a slice: maintained answer == batch rebuild over survivors
    TextRetrieval.incRemove(spark, dir, docs.filter(id % 5 === 2), id, tx)
    val batchDir2 = freshDir("text_inc_idx_batch2")
    TextRetrieval.buildIndex(spark, docs.filter(id % 5 =!= 2), id, tx,
      batchDir2)
    val inc2 = TextRetrieval.incExactTopK(spark, dir, terms, k = 15)
      .as[(Long, Long)].collect().toSeq
    val full2 = TextRetrieval.exactTopK(spark, batchDir2, terms, k = 15)
      .as[(Long, Long)].collect().toSeq
    assert(inc2 == full2)

    // the graft postings scan lists only the query terms' partitions —
    // the index carries outstanding MOR deltas (r13: the state tables are
    // MOR), so the read mounts GraftMorRelation, whose partition-path
    // filter prunes the file-GROUP set at planning time
    // (lastPlannedFiles is its observability hook, base + delta paths)
    val q = TextRetrieval.incExactTopK(spark, dir, terms, k = 15)
    q.collect()
    val buckets = terms.map(TextRetrieval.termBucket(_, 16)).toSet
    val rels = q.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.read.GraftMorRelation] &&
            l.relation.asInstanceOf[graft.read.GraftMorRelation]
              .lastPlannedFiles.exists(_.contains("/postings/")) =>
        l.relation.asInstanceOf[graft.read.GraftMorRelation]
    }
    assert(rels.size == 1, "postings must mount the MOR relation")
    val pruned = rels.head.lastPlannedFiles
    assert(pruned.nonEmpty && pruned.forall(f =>
      buckets.exists(b => f.contains(s"/$b/"))),
      s"planned listing escaped the query buckets: $pruned")
  }

  test("maintenance composes: cluster_sort of the postings table by term " +
    "leaves maintained-index answers and views untouched") {
    val dir = freshDir("text_inc_sorted")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(90)
    val id = col("doc_id"); val tx = col("text")
    val terms = Seq("spark", "join")
    TextRetrieval.incIngest(spark, dir, docs.filter(id % 2 === 0), id, tx)
    TextRetrieval.incIngest(spark, dir, docs.filter(id % 2 === 1), id, tx)
    val before = TextRetrieval.incExactTopK(spark, dir, terms, k = 10)
      .as[(Long, Long)].collect().toSeq
    val dfvTl = graft.format.Timeline(
      spark.sessionState.newHadoopConf(), s"$dir/dfv")
    val viewCommits = dfvTl.completedInstants().size
    // layout-only CLUSTER commit: postings re-sorted by term within each
    // slice — identity preserved, CDC emits nothing
    graft.write.TableMaintenance.sortLayout(spark, s"$dir/postings",
      "20270101000000", Seq("term"))
    // another ingest after the layout rewrite keeps converging
    val after = TextRetrieval.incExactTopK(spark, dir, terms, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(after == before)
    // the df view saw no churn from the layout commit: a refresh is a
    // no-op (CDC emits nothing for CLUSTER commits)
    graft.views.MaterializedAgg.refresh(spark, s"$dir/postings",
      s"$dir/dfv", "term", Seq("tf" -> col("tf")))
    dfvTl.refresh()
    assert(dfvTl.completedInstants().size == viewCommits,
      "layout-only commit must not mint a view commit")
  }

  test("hybrid RRF equals an in-memory fusion of the two pools") {
    import graft.pipeline.{Similarity, TextRetrieval => TR}
    val terms = Seq("spark", "join", "window")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val poolK = 30
    val got = TR.hybridRrfTopK(spark, idx, terms, emb, col("vec_id"),
        col("embedding"), queryVecId = 0L, k = 100, poolK = poolK)
      .select($"doc_id", $"rrf_s").as[(Long, Long)].collect().toSeq

    val lex = TR.exactTopK(spark, idx, terms, poolK)
      .select($"doc_id").as[Long].collect().toSeq.zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    val vec = Similarity.bruteForceTopK(emb, col("vec_id"),
        col("embedding"), emb.filter($"vec_id" === 0L), col("vec_id"),
        col("embedding"), poolK)
      .select($"corpus_id", $"rank").as[(Long, Int)].collect().toSeq
      .map { case (d, r) => d -> r.toLong }.toMap
    val want = (lex.keySet ++ vec.keySet).toSeq
      .map { d =>
        val s = lex.get(d).map(r => 1000000L / (60L + r)).getOrElse(0L) +
          vec.get(d).map(r => 1000000L / (60L + r)).getOrElse(0L)
        (d, s)
      }
      .sortBy { case (d, s) => (-s, d) }.take(100)
    assert(got == want)
  }

  test("phrase search equals an in-memory scan of the raw text, " +
    "including 3-term and repeated-term phrases; inc index agrees") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val texts = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    def refCounts(phrase: Seq[String]): Map[Long, Long] =
      texts.flatMap { case (id, t) =>
        val toks = t.trim.toLowerCase.split("\\s+").toSeq
        val n = toks.sliding(phrase.size).count(_ == phrase)
        if (n > 0) Some(id -> n.toLong) else None
      }
    def topK(m: Map[Long, Long], k: Int): Seq[(Long, Long)] =
      m.toSeq.sortBy { case (d, n) => (-n, d) }.take(k)

    for (phrase <- Seq(Seq("table", "hash"), Seq("the", "fast", "key"),
        Seq("batch", "batch"))) {
      val got = TextRetrieval.phraseTopK(spark, idx, phrase, k = 500)
        .as[(Long, Long)].collect().toSeq
      assert(got == topK(refCounts(phrase), 500), s"phrase $phrase")
    }

    // the maintained index answers phrases identically
    val dir = freshDir("text_inc_phrase")
    TextRetrieval.incIngest(spark, dir, docs, $"doc_id", $"text")
    val incGot = TextRetrieval.incPhraseTopK(spark, dir,
      Seq("table", "hash"), k = 500).as[(Long, Long)].collect().toSeq
    assert(incGot == topK(refCounts(Seq("table", "hash")), 500))
  }

  test("incremental ingest is transactional: a failure between the " +
    "postings and doclen commits publishes to NEITHER table") {
    import graft.write.MultiTableTxn
    val dir = freshDir("text_inc_txn")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(60)
    val id = col("doc_id"); val tx = col("text")
    TextRetrieval.incIngest(spark, dir, docs.filter(id % 2 === 0), id, tx)
    def counts: (Int, Int) = {
      def n(p: String) = graft.format.Timeline(
        spark.sessionState.newHadoopConf(), p).completedInstants().size
      (n(s"$dir/postings"), n(s"$dir/doclen"))
    }
    assert(counts == ((1, 1)))

    // the same frames the ingest stages, but the publish faults after
    // staging: all-or-nothing means NO commit lands on EITHER table
    val (postFrame, dlFrame) = TextRetrieval.incFrames(
      docs.filter(id % 2 === 1), id, tx, termBuckets = 16)
    intercept[RuntimeException](MultiTableTxn.commitHook(spark, Seq(
        MultiTableTxn.TableWrite(s"$dir/postings",
          updates = Some(postFrame)),
        MultiTableTxn.TableWrite(s"$dir/doclen", updates = Some(dlFrame))),
      beforePublish = () => throw new RuntimeException("crash")))
    assert(counts == ((1, 1)), "a faulted ingest must publish nothing")

    // a clean retry lands on BOTH tables and the index converges
    TextRetrieval.incIngest(spark, dir, docs.filter(id % 2 === 1), id, tx)
    assert(counts == ((2, 2)))
    val batchDir = freshDir("text_inc_txn_batch")
    TextRetrieval.buildIndex(spark, docs, id, tx, batchDir)
    val inc = TextRetrieval.incExactTopK(spark, dir,
      Seq("spark", "join"), k = 10).as[(Long, Long)].collect().toSeq
    val full = TextRetrieval.exactTopK(spark, batchDir,
      Seq("spark", "join"), k = 10).as[(Long, Long)].collect().toSeq
    assert(inc == full)
  }

  test("streaming docs maintain the index: a graft doc-table stream " +
    "drives incIngest per micro-batch, converging to the batch answer") {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = freshDir("text_stream_src")
    val idxDir = freshDir("text_stream_idx")
    val ckpt = freshDir("text_stream_ckpt")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(80)
      .select($"doc_id", $"text")
    // a 2-commit versioned docs table: the streaming source yields one
    // micro-batch per commit; each drives one maintained-index batch
    val w = new graft.write.CowWriter(spark, srcDir, numBuckets = 2)
    w.insert(docs.filter($"doc_id" % 2 === 0)
      .withColumn("pt", lit("all")), $"doc_id", $"pt", Fixtures.C1)
    w.upsert(docs.filter($"doc_id" % 2 === 1)
      .withColumn("pt", lit("all")), $"doc_id", $"pt", Fixtures.C2)

    val q = spark.readStream.format("graft")
      .option("maxCommitsPerBatch", "1").load(srcDir)
      .select($"doc_id", $"text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          TextRetrieval.incIngest(spark, idxDir, batch,
            col("doc_id"), col("text"))
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    val batchDir = freshDir("text_stream_batch")
    TextRetrieval.buildIndex(spark, docs, $"doc_id", $"text", batchDir)
    val streamed = TextRetrieval.incExactTopK(spark, idxDir,
      Seq("spark", "join"), k = 10).as[(Long, Long)].collect().toSeq
    val batch = TextRetrieval.exactTopK(spark, batchDir,
      Seq("spark", "join"), k = 10).as[(Long, Long)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("guards: phrase search refuses a df-capped index; the exact " +
    "scorer refuses a corpus beyond its Long-exact bound") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(40)
    val id = col("doc_id"); val tx = col("text")
    // capped build: postings of frequent terms were DROPPED — phrase
    // matches through them would silently vanish, so the API refuses
    val capped = freshDir("text_guard_capped")
    TextRetrieval.buildIndex(spark, docs, id, tx, capped,
      maxDfPermille = 500)
    val e1 = intercept[IllegalArgumentException](
      TextRetrieval.phraseTopK(spark, capped, Seq("the", "fast"), k = 5))
    assert(e1.getMessage.contains("uncapped"))
    // BM25 over the same capped index stays legal
    assert(TextRetrieval.exactTopK(spark, capped, Seq("spark"), k = 5)
      .count() >= 0)

    // doctored sidecar claiming 9M docs: idf*tf would overflow Long, the
    // exact scorer must refuse with a pointer at the fp scorer
    val big = freshDir("text_guard_big")
    TextRetrieval.buildIndex(spark, docs, id, tx, big)
    val st = spark.read.parquet(s"$big/stats").head()
    Seq((9000000L, st.getLong(1), 1000))
      .toDF("n", "sdl", "max_df_permille")
      .coalesce(1).write.mode("overwrite").parquet(s"$big/stats")
    val e2 = intercept[IllegalArgumentException](
      TextRetrieval.exactTopK(spark, big, Seq("spark"), k = 5).count())
    assert(e2.getMessage.contains("bm25TopK"))
  }

  test("MaxScore pruning is lossless and actually prunes a hot term (r11)") {
    // the 500-doc corpus sits below the production cost/benefit gates —
    // drop both so the pruning logic itself is exercised
    spark.conf.set("spark.graft.text.wandMinPostings", "0")
    spark.conf.set("spark.graft.text.wandMinCorpusTokens", "0")
    try testWand()
    finally {
      spark.conf.unset("spark.graft.text.wandMinPostings")
      spark.conf.unset("spark.graft.text.wandMinCorpusTokens")
    }
  }

  private def testWand(): Unit = {
    // skewed corpus: a HOT term in 90% of docs, rare terms df ≈ 10
    val docs = spark.range(0, 500).select(col("id"),
      concat_ws(" ",
        when(col("id") % 10 =!= 0, lit("hottt")).otherwise(lit("cold")),
        concat(lit("rare"), (col("id") % 50).cast("string")),
        concat(lit("word"), (col("id") % 25).cast("string"))).as("text"))
    val dir = "/tmp/graft_test/wand_idx"
    TextRetrieval.buildIndex(spark, docs, col("id"), col("text"), dir,
      termBuckets = 4)
    // the impacts sidecar exists and serves the floor
    val terms = Seq("rare7", "word3", "hottt")
    val cand = TextRetrieval.wandCandidates(spark, dir, terms, k = 5,
      termBuckets = 4)
    assert(cand.isDefined, "impacts sidecar should enable pruning")
    val nCand = cand.get.count()
    val nDocs = docs.count()
    // rare7's 5th impact beats the hot term's best: hot-only docs pruned
    assert(nCand < nDocs / 4,
      s"expected strong pruning, got $nCand of $nDocs candidate docs")
    // LOSSLESS: pruned top-k == the full-scan top-k, bit for bit, for
    // every k the sidecar serves (incl. k at the ImpactTopK boundary)
    def full(ts: Seq[String], k: Int) = {
      val st = spark.read.parquet(s"$dir/stats").head()
      // unpruned reference: same scorer over an impacts-free twin
      val dir2 = "/tmp/graft_test/wand_idx_ref"
      TextRetrieval.exactTopK(spark, dir2, ts, k, termBuckets = 4)
    }
    val dir2 = "/tmp/graft_test/wand_idx_ref"
    TextRetrieval.buildIndex(spark, docs, col("id"), col("text"), dir2,
      termBuckets = 4)
    val p = new org.apache.hadoop.fs.Path(s"$dir2/impacts")
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    for (k <- Seq(1, 5, 20, TextRetrieval.ImpactTopK)) {
      val pruned = TextRetrieval.exactTopK(spark, dir, terms, k,
        termBuckets = 4).as[(Long, Long)].collect().toSeq
      val ref = full(terms, k).as[(Long, Long)].collect().toSeq
      assert(pruned == ref, s"k=$k pruned != full: $pruned vs $ref")
    }
    // fallbacks: k beyond the sidecar, and an impacts-free index
    assert(TextRetrieval.wandCandidates(spark, dir, terms,
      k = TextRetrieval.ImpactTopK + 1, termBuckets = 4).isEmpty)
    assert(TextRetrieval.wandCandidates(spark, dir2, terms, k = 5,
      termBuckets = 4).isEmpty)
    // query of only-unknown terms: zero hits, no exception
    assert(TextRetrieval.exactTopK(spark, dir, Seq("absent"), 5,
      termBuckets = 4).count() == 0)
  }

  test("maxDfPermille drops stop-word posting lists at build time") {
    val docs = Seq(
      (1L, "the quick fox"), (2L, "the lazy dog"), (3L, "the end"),
      (4L, "rare term here")).toDF("doc_id", "text")
    val full = TextRetrieval.postings(docs, $"doc_id", $"text")
    val capped = TextRetrieval.postings(docs, $"doc_id", $"text",
      maxDfPermille = 500)
    assert(full.where($"term" === "the").count() == 3)
    assert(capped.where($"term" === "the").count() == 0) // df 3/4 > 0.5
    assert(capped.where($"term" === "rare").count() == 1)
  }
}
