package graft

import graft.format.Timeline
import org.apache.spark.sql.functions._

/** SQL `CALL` maintenance procedures ([[graft.sources.GraftProcedures]]):
  * the engine's administrative verbs driven through the DSv2
  * ProcedureCatalog — argument binding (named/positional/defaults),
  * warehouse containment, and per-verb effect + result checks against the
  * same underlying state the direct TableMaintenance calls produce. */
class ProcedureSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/proc_wh"
  private val cat = "graft_proc_test"

  private def conf(): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  private def freshTable(name: String, morType: Boolean = false): String = {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.$name")
    val tpe = if (morType) ", type 'mor'" else ""
    spark.sql(s"""CREATE TABLE $cat.ns.$name (
      id BIGINT, part STRING, v BIGINT) PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2'$tpe)""")
    s"$cat.ns.$name"
  }

  private def tl(name: String): Timeline =
    Timeline(spark.sessionState.newHadoopConf(), s"$wh/ns/$name")

  test("show_timeline / savepoint / release_savepoint round trip") {
    val t = freshTable("p1")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10),(2,'b',20)")
    spark.sql(s"INSERT INTO $t VALUES (3,'a',30)")
    val timeline = spark.sql(s"CALL $cat.system.show_timeline(table => 'ns.p1')")
      .as[(String, String, Boolean)].collect().toSeq
    assert(timeline.map(_._1) == tl("p1").completedInstants().map(_.ts))
    assert(timeline.forall(!_._3))
    // default ts = latest commit
    val pinned = spark.sql(s"CALL $cat.system.savepoint(table => 'ns.p1')")
      .as[String].head()
    assert(pinned == timeline.last._1)
    assert(spark.sql(s"CALL $cat.system.show_timeline(table => 'ns.p1')")
      .filter($"savepointed").as[(String, String, Boolean)].head()._1 == pinned)
    spark.sql(s"CALL $cat.system.release_savepoint(" +
      s"table => 'ns.p1', ts => '$pinned')")
    assert(tl("p1").savepoints().isEmpty)
  }

  test("rollback undoes commits; positional arguments bind too") {
    val t = freshTable("p2")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10)")
    val keep = tl("p2").completedInstants().last.ts
    spark.sql(s"INSERT INTO $t VALUES (2,'a',20)")
    spark.sql(s"INSERT INTO $t VALUES (3,'b',30)")
    // positional CALL: (table, to_ts)
    val undone = spark.sql(s"CALL $cat.system.rollback('ns.p2', '$keep')")
      .as[String].collect().toSeq
    assert(undone.size == 2)
    assert(spark.sql(s"SELECT id FROM $t").as[Long].collect().toSeq == Seq(1L))
    assert(tl("p2").completedInstants().last.ts == keep)
  }

  test("compact folds MOR deltas exactly once; committed flag reports it") {
    val t = freshTable("p3", morType = true)
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10),(2,'b',20)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',11),(3,'b',30)") // delta commit
    val before = spark.sql(s"SELECT id, v FROM $t ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(tl("p3").latestSlices(None).values.exists(_.deltas.nonEmpty))
    val (cts, committed) = spark.sql(
      s"CALL $cat.system.compact(table => 'ns.p3')")
      .as[(String, Boolean)].head()
    assert(committed)
    assert(tl("p3").instantAt(cts).nonEmpty)
    assert(tl("p3").latestSlices(None).values.forall(_.deltas.isEmpty))
    // snapshot unchanged by the layout fold
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id")
      .as[(Long, Long)].collect().toSeq == before)
    // nothing left to compact: default min_deltas finds no dirty group
    val again = spark.sql(s"CALL $cat.system.compact(table => 'ns.p3')")
      .as[(String, Boolean)].head()
    assert(!again._2)
    // the un-committed mint released its reservation (no marker debris)
    assert(!tl("p3").reservedTss().contains(again._1))
  }

  test("cluster_zorder + clean: layout rewrite, then old files reclaimed") {
    val t = freshTable("p4")
    spark.sql(s"INSERT INTO $t SELECT id, 'a', id * 7 FROM range(1, 200)")
    spark.sql(s"INSERT INTO $t VALUES (5,'a',999)")
    val before = spark.sql(s"SELECT sum(v) FROM $t").as[Long].head()
    val fids = spark.sql(
      s"CALL $cat.system.cluster_zorder(table => 'ns.p4', cols => 'id,v')")
      .as[String].collect().toSeq
    assert(fids.nonEmpty)
    assert(spark.sql(s"SELECT sum(v) FROM $t").as[Long].head() == before)
    val swept = spark.sql(
      s"CALL $cat.system.clean(table => 'ns.p4', retain_commits => 1)")
      .as[String].collect().toSeq
    assert(swept.nonEmpty) // the pre-cluster generation is unreachable now
    assert(spark.sql(s"SELECT sum(v) FROM $t").as[Long].head() == before)
  }

  test("drop_partitions is metadata-only; delete_view summarizes deletions") {
    val t = freshTable("p5")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10),(2,'a',20),(3,'b',30)")
    spark.sql(s"DELETE FROM $t WHERE id = 2")
    val dv = spark.sql(s"CALL $cat.system.delete_view(table => 'ns.p5')")
      .as[(String, Long, String)].head()
    assert(dv._2 == 1L)
    assert(dv._3 == s"$wh/ns/p5/.delete/${dv._1}")
    // the materialized cache itself carries the deleted row
    assert(spark.read.parquet(dv._3).count() == 1)
    val nFilesBefore = tl("p5").completedInstants()
      .flatMap(i => tl("p5").metadata(i.ts).allStats.flatMap(_._2.path))
      .distinct.size
    val superseded = spark.sql(
      s"CALL $cat.system.drop_partitions(table => 'ns.p5', partitions => 'a')")
      .as[String].collect().toSeq
    assert(superseded.nonEmpty)
    assert(spark.sql(s"SELECT id FROM $t").as[Long].collect().toSeq == Seq(3L))
    // metadata-only: no new data files were written by the drop
    val nFilesAfter = tl("p5").completedInstants()
      .flatMap(i => tl("p5").metadata(i.ts).allStats.flatMap(_._2.path))
      .distinct.size
    assert(nFilesAfter == nFilesBefore)
  }

  test("rebucket rescales the file-group grain through CALL") {
    val t = freshTable("p6")
    spark.sql(s"INSERT INTO $t SELECT id, 'a', id FROM range(1, 100)")
    val fids = spark.sql(
      s"CALL $cat.system.rebucket(table => 'ns.p6', buckets => 4)")
      .as[String].collect().toSeq
    assert(fids.toSet.size == 4)
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 99)
    assert(graft.read.SnapshotReader.recordedBuckets(tl("p6"), None)
      .contains(4))
  }

  test("containment and unknown-procedure guards") {
    conf()
    freshTable("p7")
    // a table argument cannot escape the warehouse directory
    val e1 = intercept[Exception](spark.sql(
      s"CALL $cat.system.show_timeline(table => '`..`.p7')"))
    assert(e1.getMessage.contains("escape") ||
      e1.getMessage.contains("illegal"))
    // unknown procedure names fail to resolve with the known list, as
    // the ANALYSIS error CALL resolution expects (ROUTINE_NOT_FOUND) —
    // not an internal-error-shaped NoSuchElementException (r10 review)
    val e2 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      s"CALL $cat.system.no_such_proc(table => 'ns.p7')"))
    assert(e2.getMessage.contains("no_such_proc"))
    // a wrong NAMESPACE names the right fix instead of claiming a
    // correctly-named procedure is unknown
    val e3 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      s"CALL $cat.clean(table => 'ns.p7')"))
    assert(e3.getMessage.contains("system"))
    // a non-table path fails resolution, not silently returns empty
    intercept[Exception](spark.sql(
      s"CALL $cat.system.show_timeline(table => 'ns.not_a_table')"))
  }

  test("SHOW PROCEDURES lists the system namespace surface") {
    conf()
    val names = spark.sql(s"SHOW PROCEDURES IN $cat")
      .select("procedure_name").as[String].collect().toSet
    assert(Set("clean", "compact", "rollback", "restore", "savepoint",
      "release_savepoint", "archive", "cluster_sort", "cluster_zorder",
      "rebucket", "drop_partitions", "sweep_orphans", "delete_view",
      "show_timeline", "text_index_build", "text_search",
      "phrase_search").subsetOf(names))
  }

  test("text_index_build / text_search / phrase_search: SQL-only BM25 " +
    "retrieval over a catalog table, equal to the library path") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.docs")
    spark.sql(s"""CREATE TABLE $cat.ns.docs (doc_id BIGINT, text STRING,
      pt STRING) PARTITIONED BY (pt)
      TBLPROPERTIES (key 'doc_id', buckets '2')""")
    spark.read.parquet(s"$sf0001/documents.parquet").limit(150)
      .select($"doc_id", $"text")
      .createOrReplaceTempView("proc_docs_src")
    spark.sql(s"INSERT INTO $cat.ns.docs " +
      "SELECT doc_id, text, 'all' FROM proc_docs_src")

    val built = spark.sql(s"CALL $cat.system.text_index_build(" +
      "table => 'ns.docs', id_col => 'doc_id', text_col => 'text')")
      .as[(Long, Long, String)].head()
    assert(built._1 == 150L, s"n_docs ${built._1}")
    assert(built._3.endsWith("/.text_index"))

    val got = spark.sql(s"CALL $cat.system.text_search(" +
      "table => 'ns.docs', terms => 'spark join', k => 7)")
      .as[(Long, Long)].collect().toSeq
    val want = graft.pipeline.TextRetrieval.exactTopK(spark, built._3,
      Seq("spark", "join"), k = 7).as[(Long, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)

    val gotP = spark.sql(s"CALL $cat.system.phrase_search(" +
      "table => 'ns.docs', phrase => 'table hash', k => 7)")
      .as[(Long, Long)].collect().toSeq
    val wantP = graft.pipeline.TextRetrieval.phraseTopK(spark, built._3,
      Seq("table", "hash"), k = 7).as[(Long, Long)].collect().toSeq
    assert(gotP == wantP)

    // more_like_this: the doc text resolves by key lookup, the search
    // equals the library path over the same resolved text
    val srcId = spark.sql(s"SELECT min(doc_id) FROM $cat.ns.docs")
      .as[Long].head()
    val gotM = spark.sql(s"CALL $cat.system.more_like_this(" +
      s"table => 'ns.docs', doc_id => ${srcId}L, text_col => 'text', " +
      "k => 6)").as[(Long, Long)].collect().toSeq
    val srcText = spark.sql(
      s"SELECT text FROM $cat.ns.docs WHERE doc_id = $srcId")
      .as[String].head()
    val wantM = graft.pipeline.TextRetrieval.moreLikeThis(spark, built._3,
      srcText, srcId, k = 6).as[(Long, Long)].collect().toSeq
    assert(gotM == wantM && gotM.nonEmpty)
    // a missing doc id fails loudly, not with an empty result
    intercept[Exception](spark.sql(s"CALL $cat.system.more_like_this(" +
      "table => 'ns.docs', doc_id => 999999999L, text_col => 'text')"))
  }

  test("substr_dedup / exact_quantiles procedures: summary row + " +
      "materialized cleaned corpus") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.txt")
    spark.sql(s"CREATE TABLE $cat.ns.txt (id BIGINT, body STRING, " +
      "pt STRING) PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'id', buckets '2')")
    val span = (1 to 8).map(i => s"d$i").mkString(" ")
    spark.sql(s"INSERT INTO $cat.ns.txt VALUES " +
      s"(1, 'aa bb $span cc', 'all'), (2, 'xx $span yy', 'all'), " +
      "(3, 'unique text only here', 'all')")
    val sd = spark.sql(s"CALL $cat.system.substr_dedup(" +
      "table => 'ns.txt', id_col => 'id', text_col => 'body')").head()
    assert(sd.getLong(0) == 3L && sd.getLong(1) == 2L &&
      sd.getLong(2) == 16L)
    val cleaned = spark.read.parquet(sd.getString(3))
    assert(cleaned.filter($"doc_id" === 1).head().getString(1) ==
      "aa bb cc")
    val q = spark.sql(s"CALL $cat.system.exact_quantiles(" +
      "table => 'ns.txt', column => 'id', probs => '0.5,1.0')")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(q(500) == 2.0 && q(1000) == 3.0)
  }

  test("lm_coverage procedure: reference-slice scoring lands in the " +
      "dot-dir with a faithful summary") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.lmdocs")
    spark.sql(s"CREATE TABLE $cat.ns.lmdocs (id BIGINT, body STRING, " +
      "src STRING, pt STRING) PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'id', buckets '2')")
    spark.sql(s"INSERT INTO $cat.ns.lmdocs VALUES " +
      "(1, 'a b c a b c', 'ref', 'all'), " + // ref: 'a b'/'b c' x2, 'c a' x1
      "(2, 'a b c', 'crawl', 'all'), " +     // both bigrams known -> 1000
      "(3, 'x y z', 'crawl', 'all')")        // none known -> 0
    val s0 = spark.sql(s"CALL $cat.system.lm_coverage(" +
      "table => 'ns.lmdocs', id_col => 'id', text_col => 'body', " +
      "ref_predicate => \"src = 'ref'\")").head()
    assert(s0.getLong(0) == 3L)
    val scored = spark.read.parquet(s0.getString(2))
      .orderBy($"doc_id")
      .select($"doc_id", $"lm_coverage_permille").collect()
    assert(scored(1).getLong(1) == 1000L && scored(2).getLong(1) == 0L)
    assert(s0.getLong(1) ==
      (scored.map(_.getLong(1)).sum / 3))
  }

  test("knn_graph procedure: exhaustive nprobe yields k edges per vector") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.emb")
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("emb_src")
    spark.sql(s"CREATE TABLE $cat.ns.emb PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'vec_id', buckets '2') " +
      "AS SELECT vec_id, embedding, 'all' AS pt FROM emb_src")
    val kg = spark.sql(s"CALL $cat.system.knn_graph(table => 'ns.emb', " +
      "id_col => 'vec_id', vec_col => 'embedding', k => 3, " +
      "nlist => 4, nprobe => 4)").head()
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(kg.getLong(0) == n * 3, "k edges per vector at exhaustive probe")
    assert(kg.getLong(1) > 0 && kg.getLong(1) <= kg.getLong(0))
    assert(spark.read.parquet(kg.getString(2)).count() == kg.getLong(0))

    // compressed-domain twin at exhaustive probe + full rerank: the edge
    // SET must equal the full-vector graph's (exactness regardless of
    // quantization — the rerank reads true vectors)
    val pq = spark.sql(s"CALL $cat.system.knn_graph_pq(table => 'ns.emb', " +
      "id_col => 'vec_id', vec_col => 'embedding', dim => 64, k => 3, " +
      "nlist => 4, nprobe => 4, rerank => 1000000)").head()
    assert(pq.getLong(0) == n * 3 && pq.getLong(1) == kg.getLong(1))
    val full = spark.read.parquet(kg.getString(2))
      .select("query_id", "corpus_id", "rank")
    val comp = spark.read.parquet(pq.getString(2))
      .select("query_id", "corpus_id", "rank")
    assert(full.exceptAll(comp).isEmpty && comp.exceptAll(full).isEmpty)

    // opq_iters routes through the rotation (r14): inner products are
    // preserved, so the exhaustive edge set is STILL the full-vector one
    val opq = spark.sql(s"CALL $cat.system.knn_graph_pq(table => 'ns.emb', " +
      "id_col => 'vec_id', vec_col => 'embedding', dim => 64, k => 3, " +
      "nlist => 4, nprobe => 4, rerank => 1000000, opq_iters => 1)").head()
    assert(opq.getLong(0) == n * 3 && opq.getLong(1) == kg.getLong(1))
    val rot = spark.read.parquet(opq.getString(2))
      .select("query_id", "corpus_id", "rank")
    assert(full.exceptAll(rot).isEmpty && rot.exceptAll(full).isEmpty)
  }

  test("bpe_tokens procedure: trains on the table, counts land; " +
      "concatenated token text is lossless vs the whitespace words") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.docs_bpe")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .createOrReplaceTempView("docs_src")
    spark.sql(s"CREATE TABLE $cat.ns.docs_bpe PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'doc_id', buckets '2') " +
      "AS SELECT doc_id, text, 'all' AS pt FROM docs_src")
    val r = spark.sql(s"CALL $cat.system.bpe_tokens(" +
      "table => 'ns.docs_bpe', id_col => 'doc_id', text_col => 'text', " +
      "num_merges => 32)").head()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(2) == 32L)
    val counts = spark.read.parquet(r.getString(3))
    assert(counts.count() == docs.count())
    // with 32 merges on the closed vocabulary, tokens per doc must be
    // strictly fewer than characters and at least the word count
    import org.apache.spark.sql.functions._
    val j = docs.select(col("doc_id").as("id"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long")
          .as("n_words"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long")
          .as("n_chars"))
      .join(counts, "id")
    assert(j.filter(col("n_tokens") < col("n_words") ||
      col("n_tokens") > col("n_chars")).isEmpty)
  }

  test("rep_filters procedure: both score sets land, summary maxima " +
      "match the materialized rows, every doc present") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.docs_rep")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .createOrReplaceTempView("docs_rep_src")
    spark.sql(s"CREATE TABLE $cat.ns.docs_rep PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'doc_id', buckets '2') " +
      "AS SELECT doc_id, text, 'all' AS pt FROM docs_rep_src")
    val r = spark.sql(s"CALL $cat.system.rep_filters(" +
      "table => 'ns.docs_rep', id_col => 'doc_id', " +
      "text_col => 'text')").head()
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(r.getLong(0) == n)
    val tg = spark.read.parquet(s"${r.getString(3)}/topgram")
    val dc = spark.read.parquet(s"${r.getString(3)}/dupcov")
    import org.apache.spark.sql.functions._
    assert(tg.count() == n * 3 && dc.count() == n) // orders 2,3,4
    assert(tg.agg(max(col("permille"))).head().getLong(0) == r.getLong(1))
    assert(dc.agg(max(col("permille"))).head().getLong(0) == r.getLong(2))
  }

  test("seg_dedup procedure: cleaned docs land, summary matches, and the " +
      "result equals the library call") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.docs_seg")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .createOrReplaceTempView("docs_seg_src")
    spark.sql(s"CREATE TABLE $cat.ns.docs_seg PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'doc_id', buckets '2') " +
      "AS SELECT doc_id, text, 'all' AS pt FROM docs_seg_src")
    val r = spark.sql(s"CALL $cat.system.seg_dedup(" +
      "table => 'ns.docs_seg', id_col => 'doc_id', " +
      "text_col => 'text', width => 5)").head()
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(r.getLong(0) == src.count())
    val landed = spark.read.parquet(r.getString(3))
    import org.apache.spark.sql.functions._
    val direct = graft.pipeline.Dedup.segmentDedup(
      src, col("doc_id"), col("text"), width = 5)
    assert(landed.orderBy("doc_id").collect().toSeq ==
      direct.orderBy("doc_id").collect().toSeq)
    assert(landed.agg(sum(col("segs_removed"))).head().getLong(0) ==
      r.getLong(2))
    assert(r.getLong(2) > 0, "corpus should carry duplicated segments")
  }

  test("seg_ingest / substr_ingest procedures: arrival-order batches " +
      "maintain the transactional indexes, the recorded unit contract " +
      "refuses a drifting CALL (r16)") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.docs_inc")
    // 4 docs, the 5-token boilerplate planted in docs 1 and 3 (separate
    // arrival batches) — the second arrival must drop its copy
    Seq(
      (1L, "ib1 ib2 ib3 ib4 ib5", "all"),
      (2L, "u1 u2 u3 u4 u5", "all"),
      (3L, "ib1 ib2 ib3 ib4 ib5", "all"),
      (4L, "v1 v2 v3 v4 v5", "all"))
      .toDF("doc_id", "text", "pt")
      .createOrReplaceTempView("docs_inc_src")
    spark.sql(s"CREATE TABLE $cat.ns.docs_inc PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'doc_id', buckets '2') " +
      "AS SELECT * FROM docs_inc_src")
    val b1 = spark.sql(s"CALL $cat.system.seg_ingest(" +
      "table => 'ns.docs_inc', id_col => 'doc_id', text_col => 'text', " +
      "batch_predicate => 'doc_id <= 2', width => 5)").head()
    assert(b1.getLong(0) == 2L && b1.getLong(1) == 0L)
    val b2 = spark.sql(s"CALL $cat.system.seg_ingest(" +
      "table => 'ns.docs_inc', id_col => 'doc_id', text_col => 'text', " +
      "batch_predicate => 'doc_id > 2', width => 5)").head()
    assert(b2.getLong(0) == 2L && b2.getLong(1) == 1L,
      s"arrival batch 2 must drop doc 3's copy (got ${b2.getLong(1)})")
    // the recorded contract refuses a drifting width, naming both units
    val e = intercept[Exception](spark.sql(s"CALL $cat.system.seg_ingest(" +
      "table => 'ns.docs_inc', id_col => 'doc_id', text_col => 'text', " +
      "batch_predicate => 'doc_id > 100', width => 3)").collect())
    assert(e.getMessage.contains("token:3") &&
      e.getMessage.contains("token:5"), e.getMessage)

    // ExactSubstr twin over a fresh table (8-token window in docs 1, 3)
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.docs_sub")
    Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8", "all"),
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8", "all"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8", "all"))
      .toDF("doc_id", "text", "pt")
      .createOrReplaceTempView("docs_sub_src")
    spark.sql(s"CREATE TABLE $cat.ns.docs_sub PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'doc_id', buckets '2') " +
      "AS SELECT * FROM docs_sub_src")
    val s1 = spark.sql(s"CALL $cat.system.substr_ingest(" +
      "table => 'ns.docs_sub', id_col => 'doc_id', text_col => 'text', " +
      "batch_predicate => 'doc_id <= 2', w => 8)").head()
    assert(s1.getLong(0) == 2L && s1.getLong(1) == 0L)
    val s2 = spark.sql(s"CALL $cat.system.substr_ingest(" +
      "table => 'ns.docs_sub', id_col => 'doc_id', text_col => 'text', " +
      "batch_predicate => 'doc_id = 3', w => 8)").head()
    assert(s2.getLong(0) == 1L && s2.getLong(1) == 8L,
      s"doc 3's duplicated window must cut 8 tokens (got ${s2.getLong(1)})")
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.substr_ingest(" +
        "table => 'ns.docs_sub', id_col => 'doc_id', " +
        "text_col => 'text', batch_predicate => 'doc_id > 100', " +
        "w => 4)").collect())
    assert(e2.getMessage.contains("window:4") &&
      e2.getMessage.contains("window:8"), e2.getMessage)
  }

  test("ann_index_build + ann_search: exhaustive probe + full rerank " +
      "equals brute force; pca variant records the reduced dim") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.embs")
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("embs_ann_src")
    spark.sql(s"CREATE TABLE $cat.ns.embs PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'vec_id', buckets '2') " +
      "AS SELECT vec_id, embedding, 'all' AS pt FROM embs_ann_src")
    val b = spark.sql(s"CALL $cat.system.ann_index_build(" +
      "table => 'ns.embs', id_col => 'vec_id', vec_col => 'embedding', " +
      "dim => 64, nlist => 4, variant => 'pca', rank => 16)").head()
    assert(b.getInt(0) == 4 && b.getInt(1) == 16)
    val got = spark.sql(s"CALL $cat.system.ann_search(" +
      "table => 'ns.embs', id_col => 'vec_id', vec_col => 'embedding', " +
      "query_predicate => 'vec_id < 10', k => 5, nprobe => 4, " +
      "rerank => 1000000)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    import org.apache.spark.sql.functions._
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val brute = graft.pipeline.Similarity.bruteForceTopK(
        embs, col("vec_id"), col("embedding"),
        embs.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
        k = 5)
      .select(col("query_id"), col("corpus_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
    // realistic knobs stay k-bounded and well-formed
    val fast = spark.sql(s"CALL $cat.system.ann_search(" +
      "table => 'ns.embs', id_col => 'vec_id', vec_col => 'embedding', " +
      "query_predicate => 'vec_id < 3', k => 3)").collect()
    assert(fast.length == 9 &&
      fast.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 3))
  }

  test("ann_ingest procedure: a batch appended through the persisted " +
      "sidecars serves exactly over the grown index") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.embs_grow")
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("embs_grow_src")
    // index built over 2/3 of the corpus, PCA variant (so ingest must
    // re-apply the STORED projection to the batch)
    spark.sql(s"CREATE TABLE $cat.ns.embs_grow PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'vec_id', buckets '2') " +
      "AS SELECT vec_id, embedding, 'all' AS pt FROM embs_grow_src " +
      "WHERE vec_id % 3 <> 2")
    val b = spark.sql(s"CALL $cat.system.ann_index_build(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', dim => 64, nlist => 4, " +
      "variant => 'pca', rank => 16)").head()
    assert(b.getInt(0) == 4 && b.getInt(1) == 16)
    // the corpus grows: the remaining third lands in the table, then
    // ann_ingest appends it to the index from the directory alone
    spark.sql(s"INSERT INTO $cat.ns.embs_grow " +
      "SELECT vec_id, embedding, 'all' AS pt FROM embs_grow_src " +
      "WHERE vec_id % 3 = 2")
    import org.apache.spark.sql.functions._
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val added = embs.filter(col("vec_id") % 3 === 2).count()
    val ing = spark.sql(s"CALL $cat.system.ann_ingest(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', " +
      "batch_predicate => 'vec_id % 3 = 2', batch_id => 'b1')").head()
    assert(ing.getLong(0) == added)
    // exhaustive probe + full rerank over the GROWN index == brute force
    // over the union — ingest placed every vector and lost none
    val got = spark.sql(s"CALL $cat.system.ann_search(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', " +
      "query_predicate => 'vec_id < 10', k => 5, nprobe => 4, " +
      "rerank => 1000000)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = graft.pipeline.Similarity.bruteForceTopK(
        embs, col("vec_id"), col("embedding"),
        embs.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
        k = 5)
      .select(col("query_id"), col("corpus_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)

    // r16 idempotency: a replayed batch id refuses instead of serving
    // its vectors twice
    val e = intercept[Exception](spark.sql(s"CALL $cat.system.ann_ingest(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', " +
      "batch_predicate => 'vec_id % 3 = 2', batch_id => 'b1')").collect())
    assert(e.getMessage.contains("already committed"), e.getMessage)

    // r16 crash window: a STAGED-but-unledgered batch dir (a job that
    // died after partial task commit) is invisible to search, and a
    // re-run of the same batch id clobbers it and commits cleanly
    val annDir = s"$wh/ns/embs_grow/.ann"
    val staged = new org.apache.hadoop.fs.Path(s"$annDir/batches/b2")
    val fs = staged.getFileSystem(spark.sessionState.newHadoopConf())
    // fake a partial stage: copy one committed cell dir without a ledger
    embs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("corpus_id"),
        org.apache.spark.sql.functions.array().cast("array<int>")
          .as("codes"),
        org.apache.spark.sql.functions.lit(0.0d).as("vnorm"),
        col("embedding").as("cv"),
        org.apache.spark.sql.functions.lit(0).as("__cluster"))
      .write.partitionBy("__cluster").parquet(staged.toString)
    assert(fs.exists(staged))
    val before = spark.sql(s"CALL $cat.system.ann_search(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', " +
      "query_predicate => 'vec_id < 10', k => 5, nprobe => 4, " +
      "rerank => 1000000)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(before == brute,
      "an unledgered staged batch leaked into the search")
    // ann_stats sees exactly what search sees: the build + the one
    // ledgered batch (b1), never the staged-unledgered b2
    val stats = spark.sql(s"CALL $cat.system.ann_stats(" +
      "table => 'ns.embs_grow')").collect()
    assert(stats.length == 2 && stats.forall(_.getString(0) == "build"))
    assert(stats.map(_.getLong(3)).sum == embs.count())
    assert(!stats.exists(_.getString(2).endsWith("/b2")))
    // r17 policy columns: a third of the corpus arrived via ingest, so
    // ingested_fraction ~ 1/3 and the default 0.1 threshold recommends
    // a rebuild; a generous threshold does not
    assert(stats.map(_.getString(4)).sorted.toSeq == Seq("build", "ingest"))
    assert(stats.forall(r => math.abs(r.getDouble(5) -
      added.toDouble / embs.count()) < 1e-9))
    assert(stats.forall(_.getBoolean(7)), "rebuild_recommended must flip")
    val statsLoose = spark.sql(s"CALL $cat.system.ann_stats(" +
      "table => 'ns.embs_grow', rebuild_threshold => 0.9)").collect()
    assert(statsLoose.forall(!_.getBoolean(7)),
      "below threshold must not recommend")

    // r16 rebuild: retrain over the grown corpus from the index's own
    // stored vectors; exhaustive search over the new generation still
    // equals brute force, and prior batch ids stay refused
    val gen = spark.sql(s"CALL $cat.system.ann_rebuild(" +
      "table => 'ns.embs_grow')").head().getString(0)
    assert(gen.contains("/gen/g00001"), gen)
    val afterRebuild = spark.sql(s"CALL $cat.system.ann_search(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', " +
      "query_predicate => 'vec_id < 10', k => 5, nprobe => 4, " +
      "rerank => 1000000)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(afterRebuild == brute)
    val e2 = intercept[Exception](spark.sql(s"CALL $cat.system.ann_ingest(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', " +
      "batch_predicate => 'vec_id % 3 = 2', batch_id => 'b1')").collect())
    assert(e2.getMessage.contains("already committed"), e2.getMessage)
    // after the rebuild: one generation root holding everything, the
    // folded b1 carries no batch dir; nothing ingested since → the
    // policy columns reset
    val stats2 = spark.sql(s"CALL $cat.system.ann_stats(" +
      "table => 'ns.embs_grow')").collect()
    assert(stats2.length == 1 && stats2.head.getString(0) == "g00001")
    assert(stats2.head.getLong(3) == embs.count())
    assert(stats2.head.getDouble(5) == 0.0 && !stats2.head.getBoolean(7))

    // r17 retention: the DEFAULT clean (keep_generations = 2) retains
    // the top-level build as the previous generation — a reader that
    // resolved it just before the rebuild still completes
    assert(spark.sql(s"CALL $cat.system.ann_clean(" +
      "table => 'ns.embs_grow')").collect().isEmpty)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$annDir/data")))
    // eager clean (keep_generations = 1) reclaims the folded top level +
    // the staged b2 remains; the serving generation is untouched
    val cleaned = spark.sql(s"CALL $cat.system.ann_clean(" +
      "table => 'ns.embs_grow', keep_generations => 1)").collect()
      .map(_.getString(0)).toSet
    assert(cleaned.exists(_.endsWith("/.ann/data")) &&
      cleaned.exists(_.endsWith("/.ann/batches")), cleaned.toString)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$annDir/data")))
    val afterClean = spark.sql(s"CALL $cat.system.ann_search(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', " +
      "query_predicate => 'vec_id < 10', k => 5, nprobe => 4, " +
      "rerank => 1000000)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(afterClean == brute)
    // a second rebuild works from the cleaned state (reads g00001); the
    // default clean now retains g00001 as the previous generation, the
    // eager one drops it
    val gen2 = spark.sql(s"CALL $cat.system.ann_rebuild(" +
      "table => 'ns.embs_grow')").head().getString(0)
    assert(gen2.endsWith("g00002"))
    assert(spark.sql(s"CALL $cat.system.ann_clean(" +
      "table => 'ns.embs_grow')").collect().isEmpty)
    val cleaned2 = spark.sql(s"CALL $cat.system.ann_clean(" +
      "table => 'ns.embs_grow', keep_generations => 1)").collect()
      .map(_.getString(0)).toSet
    assert(cleaned2.exists(_.endsWith("/gen/g00001")), cleaned2.toString)
    // nothing dead left: the next clean is a no-op at any retention
    assert(spark.sql(s"CALL $cat.system.ann_clean(" +
      "table => 'ns.embs_grow', keep_generations => 1)").collect().isEmpty)

    // r17 takedown through SQL: tombstone a slice, search excludes it
    // at exhaustive settings, ann_stats reports the pending set, the
    // next rebuild removes it physically
    val delCount = embs.filter(col("vec_id") % 7 === 0).count()
    val del = spark.sql(s"CALL $cat.system.ann_delete(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "delete_predicate => 'vec_id % 7 = 0', " +
      "delete_id => 'takedown-1')").head()
    assert(del.getLong(0) == delCount)
    val live = embs.filter(col("vec_id") % 7 =!= 0)
    val bruteLive = graft.pipeline.Similarity.bruteForceTopK(
        live, col("vec_id"), col("embedding"),
        embs.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
        k = 5)
      .select(col("query_id"), col("corpus_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val afterDel = spark.sql(s"CALL $cat.system.ann_search(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', " +
      "query_predicate => 'vec_id < 10', k => 5, nprobe => 4, " +
      "rerank => 1000000)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(afterDel == bruteLive,
      "tombstoned rows must vanish from ann_search")
    val e3 = intercept[Exception](spark.sql(s"CALL $cat.system.ann_delete(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "delete_predicate => 'vec_id % 7 = 0', " +
      "delete_id => 'takedown-1')").collect())
    assert(e3.getMessage.contains("already committed"), e3.getMessage)
    val stats3 = spark.sql(s"CALL $cat.system.ann_stats(" +
      "table => 'ns.embs_grow')").collect()
    assert(stats3.exists(r => r.getString(4) == "tombstones" &&
      r.getLong(3) == delCount))
    assert(stats3.forall(_.getBoolean(7)),
      "a pending tombstone set past the threshold must recommend rebuild")
    val gen3 = spark.sql(s"CALL $cat.system.ann_rebuild(" +
      "table => 'ns.embs_grow')").head().getString(0)
    assert(gen3.endsWith("g00003"))
    val stats4 = spark.sql(s"CALL $cat.system.ann_stats(" +
      "table => 'ns.embs_grow')").collect()
    assert(stats4.length == 1 &&
      stats4.head.getLong(3) == embs.count() - delCount,
      "the rebuilt generation must physically exclude tombstoned rows")
    val afterDelRebuild = spark.sql(s"CALL $cat.system.ann_search(" +
      "table => 'ns.embs_grow', id_col => 'vec_id', " +
      "vec_col => 'embedding', " +
      "query_predicate => 'vec_id < 10', k => 5, nprobe => 4, " +
      "rerank => 1000000)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(afterDelRebuild == bruteLive)
  }

  test("takedown + drift surface (r17): seg_delete / substr_delete / " +
      "bm25_ingest-remove-search through SQL; index_status flags every " +
      "out-of-sync sidecar and clears when caught up") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.docs_td")
    spark.range(0, 60)
      .selectExpr("id AS doc_id",
        "concat('alpha beta gamma delta epsilon tok', id, " +
          "' zeta eta theta iota kappa') AS text",
        "'all' AS pt")
      .createOrReplaceTempView("docs_td_src")
    spark.sql(s"CREATE TABLE $cat.ns.docs_td PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'doc_id', buckets '2') " +
      "AS SELECT * FROM docs_td_src")
    def status(): Map[String, (Long, Long, Boolean)] =
      spark.sql(s"CALL $cat.system.index_status(table => 'ns.docs_td')")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // half-ingested segment index → flagged; fully ingested → in sync
    spark.sql(s"CALL $cat.system.seg_ingest(table => 'ns.docs_td', " +
      "id_col => 'doc_id', text_col => 'text', " +
      "batch_predicate => 'doc_id % 2 = 0', width => 5)").collect()
    assert(status()(".seg_index") == ((30L, 60L, true)))
    spark.sql(s"CALL $cat.system.seg_ingest(table => 'ns.docs_td', " +
      "id_col => 'doc_id', text_col => 'text', " +
      "batch_predicate => 'doc_id % 2 = 1', width => 5)").collect()
    assert(status()(".seg_index") == ((60L, 60L, false)))
    // takedown through SQL: seg_delete subtracts, then the table DELETE
    // brings both sides back in sync
    val segDel = spark.sql(s"CALL $cat.system.seg_delete(" +
      "table => 'ns.docs_td', id_col => 'doc_id', text_col => 'text', " +
      "delete_predicate => 'doc_id < 5', width => 5)").head()
    assert(segDel.getLong(0) == 5L)
    assert(status()(".seg_index") == ((55L, 60L, true)))
    spark.sql(s"DELETE FROM $cat.ns.docs_td WHERE doc_id < 5")
    assert(status()(".seg_index") == ((55L, 55L, false)))
    // the maintained BM25 index through SQL: ingest all, search, remove
    spark.sql(s"CALL $cat.system.bm25_ingest(table => 'ns.docs_td', " +
      "id_col => 'doc_id', text_col => 'text', " +
      "batch_predicate => 'true')").collect()
    assert(status()(".bm25_inc") == ((55L, 55L, false)))
    val hits = spark.sql(s"CALL $cat.system.bm25_search(" +
      "table => 'ns.docs_td', query => 'tok7 zeta', k => 3)").collect()
    assert(hits.nonEmpty && hits.head.getLong(0) == 7L,
      s"the doc carrying the rare term must rank first: ${hits.toSeq}")
    spark.sql(s"CALL $cat.system.bm25_remove(table => 'ns.docs_td', " +
      "id_col => 'doc_id', text_col => 'text', " +
      "delete_predicate => 'doc_id >= 50')").collect()
    assert(status()(".bm25_inc") == ((45L, 55L, true)))
    // substr index: ingest everything, delete a slice through SQL
    spark.sql(s"CALL $cat.system.substr_ingest(table => 'ns.docs_td', " +
      "id_col => 'doc_id', text_col => 'text', " +
      "batch_predicate => 'true', w => 8)").collect()
    assert(status()(".substr_index") == ((55L, 55L, false)))
    val subDel = spark.sql(s"CALL $cat.system.substr_delete(" +
      "table => 'ns.docs_td', id_col => 'doc_id', text_col => 'text', " +
      "delete_predicate => 'doc_id >= 50', w => 8)").head()
    assert(subDel.getLong(0) == 10L)
    assert(status()(".substr_index") == ((45L, 55L, true)))
  }

  test("index_status on a vector table: .ann covered rows track " +
      "ingest and tombstones (r17)") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.embs_st")
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("embs_st_src")
    spark.sql(s"CREATE TABLE $cat.ns.embs_st PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'vec_id', buckets '2') " +
      "AS SELECT vec_id, embedding, 'all' AS pt FROM embs_st_src " +
      "WHERE vec_id % 3 <> 2")
    spark.sql(s"CALL $cat.system.ann_index_build(" +
      "table => 'ns.embs_st', id_col => 'vec_id', " +
      "vec_col => 'embedding', dim => 64, nlist => 4)").collect()
    def annStatus(): (Long, Long, Boolean) =
      spark.sql(s"CALL $cat.system.index_status(table => 'ns.embs_st')")
        .collect().filter(_.getString(0) == ".ann")
        .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3))).head
    val built = annStatus()
    assert(!built._3 && built._1 == built._2, s"fresh index in sync: $built")
    // the table grows without index maintenance → flagged
    spark.sql(s"INSERT INTO $cat.ns.embs_st " +
      "SELECT vec_id, embedding, 'all' AS pt FROM embs_st_src " +
      "WHERE vec_id % 3 = 2")
    assert(annStatus()._3, "table moved without ann_ingest: stale")
    spark.sql(s"CALL $cat.system.ann_ingest(table => 'ns.embs_st', " +
      "id_col => 'vec_id', vec_col => 'embedding', " +
      "batch_predicate => 'vec_id % 3 = 2', batch_id => 'st-b1')")
      .collect()
    assert(!annStatus()._3, "after ann_ingest: in sync")
    // takedown: tombstone + table delete keep the pair in sync (covered
    // counts stored MINUS tombstoned)
    spark.sql(s"CALL $cat.system.ann_delete(table => 'ns.embs_st', " +
      "id_col => 'vec_id', delete_predicate => 'vec_id % 5 = 0', " +
      "delete_id => 'st-td1')").collect()
    assert(annStatus()._3, "tombstoned but table not yet deleted: stale")
    spark.sql(s"DELETE FROM $cat.ns.embs_st WHERE vec_id % 5 = 0")
    val after = annStatus()
    assert(!after._3 && after._1 == after._2,
      s"tombstones must subtract from covered rows: $after")
  }

  test("ann_search refuses a corpus-sized query predicate") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.embs_wide")
    spark.range(0, 10001).selectExpr("id AS vec_id",
        "array(CAST(id AS FLOAT), 1.0F) AS embedding", "'all' AS pt")
      .createOrReplaceTempView("embs_wide_src")
    spark.sql(s"CREATE TABLE $cat.ns.embs_wide PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'vec_id', buckets '2') " +
      "AS SELECT * FROM embs_wide_src")
    // the guard fires before any index read: a broad predicate would
    // collect corpus x k rows to the driver
    val e = intercept[Exception](spark.sql(s"CALL $cat.system.ann_search(" +
      "table => 'ns.embs_wide', id_col => 'vec_id', " +
      "vec_col => 'embedding', query_predicate => 'true')").collect())
    assert(e.getMessage.contains("narrow it"))
  }

  test("quality_model procedure: scores land and replay the returned " +
      "quantized weights exactly") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.docs_qm")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .createOrReplaceTempView("docs_qm_src")
    spark.sql(s"CREATE TABLE $cat.ns.docs_qm PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'doc_id', buckets '2') " +
      "AS SELECT doc_id, text, lang, n_chars, 'all' AS pt FROM docs_qm_src")
    // features deliberately backslash-free: expression strings pass
    // through TWO SQL string-literal unescapes (the CALL statement, then
    // expr()), so a regex would need quadruple escaping
    val r = spark.sql(s"CALL $cat.system.quality_model(" +
      "table => 'ns.docs_qm', id_col => 'doc_id', " +
      "features => 'n_chars; size(split(text, \" \"))', " +
      "label => 'CAST(lang = \"en\" AS DOUBLE)')").head()
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(r.getLong(0) == src.count())
    val qw = r.getString(1).split(",").map(_.toLong)
    assert(qw.length == 3)
    val landed = spark.read.parquet(r.getString(2))
    import org.apache.spark.sql.functions._
    // replay the returned integer weights over the source features: the
    // landed scores must match row for row (pure BIGINT arithmetic)
    val replay = src.select(col("doc_id").as("id"),
      (lit(qw(0)) + col("n_chars") * qw(1) +
        size(split(col("text"), " ")).cast("long") * qw(2))
        .as("score_q"))
    assert(landed.orderBy("id").collect().toSeq ==
      replay.orderBy("id").collect().toSeq)

    // cross-table serving: quality_score replays the PERSISTED sidecar
    // (feature expressions + frozen quantized weights) on a DIFFERENT
    // table — no refit; scores must equal the same integer replay
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.docs_qs")
    spark.sql(s"CREATE TABLE $cat.ns.docs_qs PARTITIONED BY (pt) " +
      "TBLPROPERTIES (key 'doc_id', buckets '2') " +
      "AS SELECT doc_id, text, lang, n_chars, 'all' AS pt " +
      "FROM docs_qm_src WHERE doc_id % 2 = 1")
    val rs = spark.sql(s"CALL $cat.system.quality_score(" +
      "table => 'ns.docs_qs', id_col => 'doc_id', " +
      "model_table => 'ns.docs_qm')").head()
    val odd = src.filter(col("doc_id") % 2 === 1)
    assert(rs.getLong(0) == odd.count())
    assert(rs.getString(1) == "ridge")
    assert(rs.getString(2) == r.getString(1)) // the SAME frozen weights
    val scored = spark.read.parquet(rs.getString(3))
    val replayOdd = odd.select(col("doc_id").as("id"),
      (lit(qw(0)) + col("n_chars") * qw(1) +
        size(split(col("text"), " ")).cast("long") * qw(2))
        .as("score_q"))
    assert(scored.orderBy("id").collect().toSeq ==
      replayOdd.orderBy("id").collect().toSeq)
  }
}
