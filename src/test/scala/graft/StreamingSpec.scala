package graft

import graft.streaming.TableTail
import graft.write.CowWriter
import org.apache.spark.sql.functions.{col, countDistinct, lit, window}

/** Micro-batch tail over the versioned table's commit timeline. */
class TableTailSpec extends SparkSpec {
  import spark.implicits._

  test("drainOnce yields each commit exactly once and resumes from cursor") {
    val dir = freshDir("tail_cow")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(200)
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(orders, col("o_orderkey"), col("o_orderstatus"), Fixtures.C1)
    w.delete(orders.filter($"o_orderkey" % 7 === 0),
      col("o_orderkey"), col("o_orderstatus"), Fixtures.C2)

    var seen = Vector.empty[(String, Long)]
    val cur1 = TableTail.drainOnce(spark, dir, None) { (ts, df) =>
      seen :+= (ts -> df.count())
    }
    assert(cur1.contains(Fixtures.C2))
    assert(seen.map(_._1) == Vector(Fixtures.C1, Fixtures.C2))
    assert(seen(0)._2 == orders.count(), "C1 increment = full insert")
    // C2 only deleted rows → incremental (Hudi semantics) shows none
    assert(seen(1)._2 == 0)

    // nothing new → no callbacks, cursor unchanged
    val cur2 = TableTail.drainOnce(spark, dir, cur1) { (_, _) => fail("no new commits") }
    assert(cur2 == cur1)

    // a new commit appears → only that one drains
    w.upsert(orders.filter($"o_orderkey" % 10 === 3 && $"o_orderkey" % 7 =!= 0)
        .withColumn("o_totalprice", $"o_totalprice" + 1),
      col("o_orderkey"), col("o_orderstatus"), Fixtures.C3)
    var tail = Vector.empty[String]
    val cur3 = TableTail.drainOnce(spark, dir, cur2) { (ts, df) =>
      tail :+= ts
      assert(df.count() ==
        orders.filter($"o_orderkey" % 10 === 3 && $"o_orderkey" % 7 =!= 0).count())
    }
    assert(tail == Vector(Fixtures.C3) && cur3.contains(Fixtures.C3))
  }

  test("table tail feeds the streaming surface: tailed hourly agg == batch") {
    import graft.streaming.EventStream
    // a 3-commit versioned EVENTS table (disjoint key ranges per commit)
    val dir = freshDir("tail_events_cow")
    val events = spark.read.parquet(s"$sf0001/events.parquet").limit(3000)
    val payloadCols = EventStream.schemaMicros.fieldNames.toSeq
    val w = new CowWriter(spark, dir, numBuckets = 2)
    val k = col("event_id")
    w.insert(events.filter(k % 3 === 0), k, col("event_type"), Fixtures.C1)
    w.upsert(events.filter(k % 3 === 1), k, col("event_type"), Fixtures.C2)
    w.upsert(events.filter(k % 3 === 2), k, col("event_type"), Fixtures.C3)

    // FIRST-CLASS source: the table tails straight into the streaming
    // surface — no drain, no staging bridge
    import org.apache.spark.sql.streaming.Trigger
    val q = EventStream.hourlyAgg(
        spark.readStream.format("graft").load(dir)
          .select(payloadCols.map(col): _*))
      .writeStream.format("memory").queryName("tailed_hourly")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("tailed_hourly")
      .orderBy("event_type", "hour_start").collect()

    // batch twin over the table's SNAPSHOT (same commits, read via the
    // format surface) must agree exactly
    val batch = EventStream.hourlyAgg(
        graft.read.SnapshotReader.read(spark, dir)
          .select(payloadCols.map(col): _*))
      .orderBy("event_type", "hour_start").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    // keys and counts exact; sum_value is a DOUBLE aggregate whose
    // summation order differs between the staged micro-batch files and the
    // snapshot scan — equal up to float associativity
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getString(0) == b.getString(0))
      assert(s.getTimestamp(1) == b.getTimestamp(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) <=
        1e-9 * math.max(math.abs(b.getDouble(3)), 1.0))
    }
  }

  test("streaming EXACT distinct via bitmap agg: windowed distinct users " +
    "== batch COUNT(DISTINCT) per window") {
    import graft.functions.Bitmap64
    import org.apache.spark.sql.streaming.Trigger
    // TypedImperativeAggregate buffers serialize into streaming state, so
    // the mergeable bitmap gives streaming the exact distinct COUNT
    // Spark's streaming aggregation cannot express natively (no
    // countDistinct in streaming; approx_count_distinct is approximate).
    val dir = freshDir("stream_distinct_cow")
    val events = spark.read.parquet(s"$sf0001/events.parquet").limit(2000)
    val w = new CowWriter(spark, dir, numBuckets = 2)
    val k = col("event_id")
    w.insert(events.filter(k % 2 === 0), k, col("event_type"), Fixtures.C1)
    w.upsert(events.filter(k % 2 === 1), k, col("event_type"), Fixtures.C2)

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type"),
          window(col("ts"), "1 hour").getField("start").as("hour_start"))
        .agg(Bitmap64.bitmapCardinality(
          Bitmap64.bitmapBuild(col("user_id"))).as("n_users"))

    val q = agg(spark.readStream.format("graft").load(dir)
        .select("event_id", "ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("stream_distinct")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("stream_distinct")
      .orderBy("event_type", "hour_start")
      .collect().map(r => (r.getString(0), String.valueOf(r.get(1)), r.getLong(2)))

    val batch = graft.read.SnapshotReader.read(spark, dir)
      .groupBy(col("event_type"),
        window(col("ts"), "1 hour").getField("start").as("hour_start"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type", "hour_start")
      .collect().map(r => (r.getString(0), String.valueOf(r.get(1)), r.getLong(2)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("graft stream source: maxCommitsPerBatch bounds each micro-batch") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("tail_rate_cow")
    val ckpt = freshDir("tail_rate_ckpt")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(300)
    val w = new CowWriter(spark, dir, numBuckets = 2)
    val k = col("o_orderkey")
    w.insert(orders.filter(k % 3 === 0), k, col("o_orderstatus"), Fixtures.C1)
    w.upsert(orders.filter(k % 3 === 1), k, col("o_orderstatus"), Fixtures.C2)
    w.upsert(orders.filter(k % 3 === 2), k, col("o_orderstatus"), Fixtures.C3)

    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft")
      .option("maxCommitsPerBatch", "1").load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.synchronized { sizes += batch.count() }; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val perCommit = Seq(0L, 1L, 2L)
      .map(r => orders.filter(k % 3 === r).count())
    assert(sizes.toSeq == perCommit,
      s"expected one bounded batch per commit $perCommit, got $sizes")
  }

  test("graft stream source: exactly-once per commit offsets across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("tail_source_cow")
    val sink = freshDir("tail_source_sink")
    val ckpt = freshDir("tail_source_ckpt")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(300)
    val w = new CowWriter(spark, dir, numBuckets = 2)
    val k = col("o_orderkey")
    // disjoint key ranges per commit → the sink's union is the snapshot
    w.insert(orders.filter(k % 3 === 0), k, col("o_orderstatus"), Fixtures.C1)
    w.upsert(orders.filter(k % 3 === 1), k, col("o_orderstatus"), Fixtures.C2)

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").load(dir)
        .select("o_orderkey")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    val afterFirst = spark.read.parquet(sink)
      .select("o_orderkey").as[Long].collect().sorted
    assert(afterFirst.toSeq ==
      orders.filter(k % 3 <= 1).select("o_orderkey").as[Long]
        .collect().sorted.toSeq,
      "first run must deliver commits C1+C2 exactly once")

    // restart with no new commits: the offset log must prevent re-delivery
    runOnce()
    assert(spark.read.parquet(sink).count() == afterFirst.length,
      "restart with no new commits re-delivered rows")

    // a new commit after restart delivers ONLY its own range
    w.upsert(orders.filter(k % 3 === 2), k, col("o_orderstatus"), Fixtures.C3)
    runOnce()
    val afterThird = spark.read.parquet(sink)
      .select("o_orderkey").as[Long].collect().sorted
    assert(afterThird.toSeq ==
      orders.select("o_orderkey").as[Long].collect().sorted.toSeq,
      "second run must deliver exactly commit C3's rows")
  }

  test("streaming segment dedup: a graft doc-table stream drives " +
      "segIngestBatch per micro-batch with exactly-once across a " +
      "mid-stream restart (r16)") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.pipeline.Dedup
    val srcDir = freshDir("seg_stream_src")
    val idxDir = freshDir("seg_stream_idx")
    val refDir = freshDir("seg_stream_ref")
    val ckpt = freshDir("seg_stream_ckpt")
    val span = "sb1 sb2 sb3 sb4 sb5"
    def docRows(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text").withColumn("pt", lit("all"))
    val w = new CowWriter(spark, srcDir, numBuckets = 2)
    // arrival order matters: doc 1 carries the boilerplate first, doc 3
    // (a later commit) repeats it — the streaming index must drop doc
    // 3's copy, exactly like sequential segIngest
    w.insert(docRows(1L -> s"$span a1 a2 a3 a4 a5", 2L -> "b1 b2 b3 b4 b5"),
      col("doc_id"), col("pt"), Fixtures.C1)
    w.upsert(docRows(3L -> s"c1 c2 c3 c4 c5 $span", 4L -> "d1 d2 d3 d4 d5"),
      col("doc_id"), col("pt"), Fixtures.C2)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxCommitsPerBatch", "1").load(srcDir)
        .select($"doc_id", $"text")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Dedup.segIngestBatch(spark, idxDir, b,
            col("doc_id"), col("text"), width = 5): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    runOnce()
    // reference: the same two batches ingested sequentially
    Dedup.segIngest(spark, refDir,
      docRows(1L -> s"$span a1 a2 a3 a4 a5", 2L -> "b1 b2 b3 b4 b5"),
      $"doc_id", $"text", width = 5, ts = Some(Fixtures.C1)): Unit
    Dedup.segIngest(spark, refDir,
      docRows(3L -> s"c1 c2 c3 c4 c5 $span", 4L -> "d1 d2 d3 d4 d5"),
      $"doc_id", $"text", width = 5): Unit
    def docsOf(d: String) = read.SnapshotReader.read(spark, s"$d/docs")
      .select($"doc_id".cast("long"), $"text_dedup", $"segs_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(docsOf(idxDir) == docsOf(refDir) && docsOf(idxDir).size == 4)
    assert(docsOf(idxDir).find(_._1 == 3L).get._3 == 1L,
      "doc 3's copy of the historical segment must drop")

    // restart mid-stream: a THIRD commit arrives after the first drain;
    // the offset log resumes exactly after C2 and doc 5's copy of the
    // (now twice-seen) segment drops against the maintained counts
    w.upsert(docRows(5L -> s"$span e1 e2 e3 e4 e5"),
      col("doc_id"), col("pt"), Fixtures.C3)
    runOnce()
    val d5 = read.SnapshotReader.read(spark, s"$idxDir/docs")
      .filter($"k" === "5").select($"text_dedup").as[String].head()
    assert(d5 == "e1 e2 e3 e4 e5", s"doc 5 kept '$d5'")

    // engine replay simulation: after a crash between the txn commit and
    // the checkpoint write, the engine re-runs the SAME micro-batch —
    // segIngestBatch must detect the fully-landed batch and skip
    val replay = Dedup.segIngestBatch(spark, idxDir,
      docRows(5L -> s"$span e1 e2 e3 e4 e5"),
      col("doc_id"), col("text"), width = 5)
    assert(replay.isEmpty, "a fully-landed replay must skip")
    val cnt = read.SnapshotReader.read(spark, s"$idxDir/segindex")
      .filter($"seg" === span).select($"cnt").as[Long].head()
    assert(cnt == 3L, s"replay must not double-count (cnt=$cnt)")
    // a PARTIAL overlap (one settled id + one fresh) is two writers or
    // id re-use — refused
    val e = intercept[IllegalArgumentException](
      Dedup.segIngestBatch(spark, idxDir,
        docRows(5L -> "x1 x2 x3 x4 x5", 6L -> "y1 y2 y3 y4 y5"),
        col("doc_id"), col("text"), width = 5))
    assert(e.getMessage.contains("partial overlap") ||
      e.getMessage.contains("not all"), e.getMessage)
  }

  test("CDC-driven index takedown: the change feed's delete pre-images " +
      "drive segDeleteBatch + annDeleteBatch exactly once across " +
      "replay (r17)") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.pipeline.{Dedup, Similarity}
    // ---- seg half: the delete rows' FULL PRE-IMAGE text (the delete
    // view artifact) is exactly what count subtraction needs ----------
    val srcDir = freshDir("cdc_td_src")
    val idxDir = freshDir("cdc_td_idx")
    val ckpt = freshDir("cdc_td_ckpt")
    val span = "t1 t2 t3 t4 t5"
    def docRows(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text").withColumn("pt", lit("all"))
    val allDocs = docRows(
      1L -> s"$span a1 a2 a3 a4 a5",
      2L -> s"$span b1 b2 b3 b4 b5", // doc 2 repeats doc 1's span
      3L -> "c1 c2 c3 c4 c5",
      4L -> "d1 d2 d3 d4 d5")
    val w = new CowWriter(spark, srcDir, numBuckets = 2)
    w.insert(allDocs, col("doc_id"), col("pt"), Fixtures.C1)
    Dedup.segIngest(spark, idxDir, allDocs, $"doc_id", $"text",
      width = 5, ts = Some(Fixtures.C1)): Unit
    // takedown: docs 2 and 3 leave the table in one delete commit
    w.delete(docRows(2L -> "", 3L -> ""), col("doc_id"), col("pt"),
      Fixtures.C2)
    def runTakedown(): Unit = {
      val q = spark.readStream.format("graft").option("cdc", "true")
        .load(srcDir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Dedup.segDeleteBatch(spark, idxDir,
            b.filter(col("_change_type") === "delete"),
            col("doc_id"), col("text"), width = 5): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    runTakedown()
    val left = read.SnapshotReader.read(spark, s"$idxDir/docs")
      .select($"doc_id".cast("long")).as[Long].collect().sorted.toSeq
    assert(left == Seq(1L, 4L), s"index docs after CDC takedown: $left")
    val spanCnt = read.SnapshotReader.read(spark, s"$idxDir/segindex")
      .filter($"seg" === span).select($"cnt").as[Long].head()
    assert(spanCnt == 1L,
      s"doc 2's span contribution must subtract (cnt=$spanCnt)")
    // stream restart: nothing new → no change; direct replay of the
    // same delete batch (crash between txn and checkpoint) skips
    runTakedown()
    assert(read.SnapshotReader.read(spark, s"$idxDir/docs").count() == 2)
    val replay = Dedup.segDeleteBatch(spark, idxDir,
      docRows(2L -> s"$span b1 b2 b3 b4 b5", 3L -> "c1 c2 c3 c4 c5"),
      col("doc_id"), col("text"), width = 5)
    assert(replay.isEmpty, "a fully-landed delete replay must skip")

    // ---- ann half: CDC deletes tombstone the vector index ------------
    val vecSrc = freshDir("cdc_td_vec_src")
    val annDir = freshDir("cdc_td_ann")
    val vckpt = freshDir("cdc_td_vec_ckpt")
    def vecRows(ids: Long*) = ids.toSeq.toDF("vec_id")
      .select($"vec_id",
        org.apache.spark.sql.functions.array((0 until 8).map(i =>
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.xxhash64($"vec_id", lit(i)),
            lit(1000)).cast("double") / 1000.0d): _*)
          .cast("array<float>").as("embedding"))
      .withColumn("pt", lit("all"))
    val vw = new CowWriter(spark, vecSrc, numBuckets = 2)
    vw.insert(vecRows(0L to 29L: _*), col("vec_id"), col("pt"),
      Fixtures.C1)
    Similarity.annIndexBuild(
      read.SnapshotReader.read(spark, vecSrc), $"vec_id", $"embedding",
      annDir, dim = 8, nlist = 2, m = 2, iters = 1): Unit
    vw.delete(vecRows(0L, 7L, 14L, 21L), col("vec_id"), col("pt"),
      Fixtures.C2)
    val vq = spark.readStream.format("graft").option("cdc", "true")
      .load(vecSrc)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
        Similarity.annDeleteBatch(spark, annDir,
          b.filter(col("_change_type") === "delete"),
          col("vec_id"), s"stream-td-$bid"): Unit
      }
      .option("checkpointLocation", vckpt)
      .trigger(Trigger.AvailableNow()).start()
    vq.awaitTermination(180000)
    val live = read.SnapshotReader.read(spark, vecSrc)
    assert(live.count() == 26)
    val queries = vecRows(3L, 7L) // one live, one deleted (may query)
    val got = Similarity.annTopK(spark, annDir, queries,
        $"vec_id", $"embedding", k = 3, nprobe = 2, rerank = 1 << 30)
      .select("query_id", "corpus_id", "rank")
    val brute = Similarity.bruteForceTopK(live, $"vec_id", $"embedding",
        queries, $"vec_id", $"embedding", k = 3)
      .select("query_id", "corpus_id", "rank")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      "CDC-tombstoned index must serve corpus-minus-deleted")
    // replay of the committed micro-batch skips; an empty batch mints
    // no tombledger entry
    assert(Similarity.annDeleteBatch(spark, annDir,
      vecRows(0L, 7L, 14L, 21L), $"vec_id", "stream-td-0").isEmpty)
    assert(Similarity.annDeleteBatch(spark, annDir,
      vecRows().filter(lit(false)), $"vec_id", "stream-td-empty").isEmpty)
    val tl = new org.apache.hadoop.fs.Path(s"$annDir/tombledger")
    val fs = tl.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tl,
      "stream-td-empty.json")), "empty batches must not mint entries")
  }

  test("graft sink: graft source drains into writeStream.format(\"graft\") exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val src = freshDir("sink_src_cow")
    val dst = freshDir("sink_dst_tbl")
    val ckpt = freshDir("sink_ckpt")
    val payloadCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(300)
      .select(payloadCols.map(col): _*)
    val w = new CowWriter(spark, src, numBuckets = 2)
    val k = col("o_orderkey")
    w.insert(orders.filter(k % 3 === 0), k, col("o_orderstatus"), Fixtures.C1)
    w.upsert(orders.filter(k % 3 === 1), k, col("o_orderstatus"), Fixtures.C2)

    var queryId: String = null // stable across restarts (same checkpoint)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxCommitsPerBatch", "1") // one source commit per batch
        .load(src)
        .select(payloadCols.map(col): _*)
        .writeStream.format("graft")
        .option("key", "o_orderkey").option("partition", "o_orderstatus")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination(120000)
      queryId = q.id.toString
    }
    def dstCommits() = graft.format.Timeline(
      spark.sessionState.newHadoopConf(), dst).completedInstants()
    def dstBatchIds() = {
      val tl = graft.format.Timeline(
        spark.sessionState.newHadoopConf(), dst)
      tl.completedInstants().flatMap(i =>
        tl.metadata(i.ts).extra.get("streaming.batchId"))
    }
    def dstRows() = spark.read.format("graft").load(dst)
      .select("o_orderkey").as[Long].collect().sorted.toSeq

    runOnce()
    // one sink commit per micro-batch, each tagged with a DISTINCT batch id
    assert(dstCommits().size == 2 && dstBatchIds() == Seq("0", "1"))
    assert(dstRows() == orders.filter(k % 3 <= 1)
      .select("o_orderkey").as[Long].collect().sorted.toSeq)

    // restart with no new source commits: no new sink commits
    runOnce()
    assert(dstCommits().size == 2, "idle restart wrote sink commits")

    // an engine REPLAY re-runs a batch id THIS query already committed —
    // the (queryId, batchId) gate must skip it; a DIFFERENT query (fresh
    // checkpoint, ids restarting at 0) writing to the same table must LAND
    // (the file sink's documented data-loss foot-gun, closed here)
    val QidProp = "sql.streaming.queryId"
    val sink = new graft.write.GraftStreamSink(spark, dst,
      Map("key" -> "o_orderkey", "partition" -> "o_orderstatus"))
    spark.sparkContext.setLocalProperty(QidProp, queryId)
    try {
      sink.addBatch(1L, orders.filter(k % 3 === 1))
      assert(dstCommits().size == 2, "replayed batch id landed twice")
      spark.sparkContext.setLocalProperty(QidProp,
        java.util.UUID.randomUUID.toString) // a brand-new query, batch 0
      sink.addBatch(0L, orders.filter(k % 3 === 1))
      assert(dstCommits().size == 3,
        "a new query's batch 0 was swallowed by the old query's gate")
    } finally spark.sparkContext.setLocalProperty(QidProp, null)

    // a new source commit drains as the next batch; the sink upserts by
    // key, so the destination converges to the source snapshot
    w.upsert(orders.filter(k % 3 === 2), k, col("o_orderstatus"), Fixtures.C3)
    runOnce()
    assert(dstRows() == orders.select("o_orderkey").as[Long]
      .collect().sorted.toSeq)
    // destination payload == source snapshot payload, row for row
    val dstPayload = spark.read.format("graft").load(dst)
      .select(payloadCols.map(col): _*)
    val srcPayload = graft.read.SnapshotReader.read(spark, src)
      .select(payloadCols.map(col): _*)
    assert(dstPayload.exceptAll(srcPayload).isEmpty &&
      srcPayload.exceptAll(dstPayload).isEmpty)
  }

  test("sink: EMPTY micro-batch lands no commit and adds NO plan execution (no pre-probe)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dst = freshDir("sink_empty_dst")
    val payloadSchema = StructType(Seq(
      StructField("k", LongType), StructField("p", StringType)))
    val seed = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(2L, "b")), 2),
      payloadSchema)
    seed.write.format("graft").option("key", "k").option("partition", "p")
      .option("buckets", "2").option("type", "mor")
      .option("ts", Fixtures.C1).save(dst)
    def commits() = graft.format.Timeline(
      spark.sessionState.newHadoopConf(), dst).completedInstants()

    // an empty frame whose PLAN EXECUTIONS are observable: every run of the
    // plan evaluates both (empty) partitions, adding 2 to the accumulator
    val acc = spark.sparkContext.longAccumulator("graft-test-evals")
    def emptyCounted() = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 2)
        .mapPartitions { it => acc.add(1); it }, payloadSchema)

    val params = Map("key" -> "k", "partition" -> "p", "type" -> "mor")
    // baseline: the bare write path on an empty frame — however many times
    // the WRITER itself executes its input
    graft.write.FormatWriter.append(spark, dst, params, emptyCounted(),
      Map.empty)
    assert(commits().size == 1, "empty append must land no commit")
    val baseline = acc.value

    // the sink must add NOTHING on top of the bare write (the old isEmpty
    // pre-probe executed the micro-batch plan once more)
    acc.reset()
    val sink = new graft.write.GraftStreamSink(spark, dst, params)
    sink.addBatch(0L, emptyCounted())
    assert(commits().size == 1, "empty micro-batch landed a commit")
    assert(acc.value <= baseline,
      s"sink executed the batch plan more than the bare write " +
        s"(${acc.value} vs $baseline partition evaluations): pre-probe is back")
    // no orphaned ts reservation either (the no-op released its mint)
    assert(graft.format.Timeline(spark.sessionState.newHadoopConf(), dst)
      .reservedTss().isEmpty, "no-op writes must release their reserved ts")

    // a NON-empty batch lands exactly one commit carrying its batch id
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(3L, "a")), 1), payloadSchema)
    sink.addBatch(1L, rows)
    val after = commits()
    assert(after.size == 2)
    val tl = graft.format.Timeline(spark.sessionState.newHadoopConf(), dst)
    assert(tl.metadata(after.last.ts).extra.get("streaming.batchId")
      .contains("1"))
    // a replayed empty batch of an already-landed id skips with ZERO plan
    // executions (replay gate fires before any job)
    acc.reset()
    sink.addBatch(1L, emptyCounted())
    assert(commits().size == 2 && acc.value == 0)
  }

  test("graft stream source: option(\"from\") tails only commits strictly after it") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("tail_from_cow")
    val ckpt = freshDir("tail_from_ckpt")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(300)
    val w = new CowWriter(spark, dir, numBuckets = 2)
    val k = col("o_orderkey")
    w.insert(orders.filter(k % 3 === 0), k, col("o_orderstatus"), Fixtures.C1)
    w.upsert(orders.filter(k % 3 === 1), k, col("o_orderstatus"), Fixtures.C2)
    w.upsert(orders.filter(k % 3 === 2), k, col("o_orderstatus"), Fixtures.C3)

    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft")
      .option("from", Fixtures.C1) // exclusive: skip the C1 bulk insert
      .option("maxCommitsPerBatch", "1").load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.synchronized { sizes += batch.count() }; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val expected = Seq(1L, 2L)
      .map(r => orders.filter(k % 3 === r).count())
    assert(sizes.toSeq == expected,
      s"expected only post-C1 commits $expected, got $sizes")
  }

  test("rate-limited tail over schema-evolved history pads pre-evolution batches") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("tail_evo_cow")
    val sink = freshDir("tail_evo_sink")
    val ckpt = freshDir("tail_evo_ckpt")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(200)
    val w = new CowWriter(spark, dir, numBuckets = 2)
    val k = col("o_orderkey")
    w.insert(orders, k, col("o_orderstatus"), Fixtures.C1)
    // C2 ADDS a column; the stream schema (newest) carries it, but batch 0
    // covers only C1, whose range plan resolves the pre-evolution schema —
    // getBatch must pad the missing column with typed nulls, not crash
    w.upsert(orders.filter(k % 10 === 3)
        .withColumn("o_note", org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("n-"), k)),
      k, col("o_orderstatus"), Fixtures.C2)

    val q = spark.readStream.format("graft")
      .option("maxCommitsPerBatch", "1").load(dir)
      .select("o_orderkey", "o_note")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val out = spark.read.parquet(sink)
    // batch 0 = the full C1 insert (o_note null), batch 1 = C2's rows
    assert(out.count() == orders.count() +
      orders.filter(k % 10 === 3).count())
    assert(out.filter($"o_note".isNull).count() == orders.count(),
      "pre-evolution batch must read the added column as null")
    assert(out.filter($"o_note".startsWith("n-")).count() ==
      orders.filter(k % 10 === 3).count())
  }

  test("graft sink replay gate: legacy commits without a query id still gate replays") {
    val dst = freshDir("sink_legacy_dst")
    val payloadCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(100)
      .select(payloadCols.map(col): _*)
    val sink = new graft.write.GraftStreamSink(spark, dst,
      Map("key" -> "o_orderkey", "partition" -> "o_orderstatus"))
    def commits() = graft.format.Timeline(
      spark.sessionState.newHadoopConf(), dst).completedInstants().size
    // legacy-tagged commit: addBatch outside a streaming execution records
    // a batch id but no query id
    sink.addBatch(0L, orders)
    assert(commits() == 1)
    // a restart replay that NOW carries a query id must still be gated by
    // the legacy commit (same sink log, pre-query-id entries)
    val QidProp = "sql.streaming.queryId"
    spark.sparkContext.setLocalProperty(QidProp,
      java.util.UUID.randomUUID.toString)
    try {
      sink.addBatch(0L, orders)
      assert(commits() == 1, "legacy-gated replay landed twice")
      sink.addBatch(1L, orders.limit(10))
      assert(commits() == 2, "the query's next batch must land")
    } finally spark.sparkContext.setLocalProperty(QidProp, null)
  }

  test("graft sink operation=delete: a key stream removes rows exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dst = freshDir("sink_del_dst")
    val ckpt = freshDir("sink_del_ckpt")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(200)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val w = new CowWriter(spark, dst, numBuckets = 2)
    w.insert(orders, col("o_orderkey"), col("o_orderstatus"), Fixtures.C1)

    // CDC-style delete stream: (key, partition) tombstones per micro-batch
    val doomed = orders.filter($"o_orderkey" % 4 === 0)
      .select($"o_orderkey", $"o_orderstatus").as[(Long, String)]
      .collect().toSeq
    val mem = MemoryStream[(Long, String)]
    mem.addData(doomed: _*)
    val q = mem.toDF().toDF("o_orderkey", "o_orderstatus")
      .writeStream.format("graft")
      .option("key", "o_orderkey").option("partition", "o_orderstatus")
      .option("operation", "delete").option("buckets", "2")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start(dst)
    q.awaitTermination(120000)

    val remaining = spark.read.format("graft").load(dst)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(remaining == orders.filter($"o_orderkey" % 4 =!= 0)
      .select("o_orderkey").as[Long].collect().sorted.toSeq,
      "delete stream must remove exactly the tombstoned keys")
    // the deletes are a real commit: the delete view reconstructs them
    val delTs = graft.format.Timeline(
      spark.sessionState.newHadoopConf(), dst)
      .completedInstants().last.ts
    assert(graft.deleteview.DeleteView(spark, dst, delTs).toDF().count() ==
      doomed.size)
  }

  test("graft sink type=mor: micro-batches land as delta commits, compactEvery bounds them") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.format.{Instant, Timeline}
    val src = freshDir("sink_mor_src")
    val dst = freshDir("sink_mor_dst")
    val ckpt = freshDir("sink_mor_ckpt")
    val payloadCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet").limit(200)
      .select(payloadCols.map(col): _*)
    val w = new CowWriter(spark, src, numBuckets = 2)
    val k = col("o_orderkey")
    // every commit touches EVERY key → every dst group gains a delta per batch
    w.insert(orders, k, col("o_orderstatus"), Fixtures.C1)
    w.upsert(orders.withColumn("o_totalprice", $"o_totalprice" + 1),
      k, col("o_orderstatus"), Fixtures.C2)
    w.upsert(orders.withColumn("o_totalprice", $"o_totalprice" + 2),
      k, col("o_orderstatus"), Fixtures.C3)

    val q = spark.readStream.format("graft")
      .option("maxCommitsPerBatch", "1").load(src)
      .select(payloadCols.map(col): _*)
      .writeStream.format("graft")
      .option("key", "o_orderkey").option("partition", "o_orderstatus")
      .option("type", "mor").option("compactEvery", "2")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start(dst)
    q.awaitTermination(120000)

    // batch 0 = base insert; batches 1, 2 = DELTA commits; after batch 2
    // every group holds 2 deltas → compactEvery=2 folds them (action
    // `commit`, no batch id — maintenance, not a sink batch)
    val tl = Timeline(spark.sessionState.newHadoopConf(), dst)
    val actions = tl.completedInstants().map(_.action)
    assert(actions == Seq(Instant.CommitAction, Instant.DeltaCommitAction,
      Instant.DeltaCommitAction, Instant.CommitAction),
      s"unexpected dst timeline $actions")
    assert(tl.latestSlices(None).values.forall(_.deltas.isEmpty),
      "compactEvery left outstanding deltas")
    // converged: dst snapshot == src snapshot (orig + 2 everywhere)
    val dstPayload = spark.read.format("graft").load(dst)
      .select(payloadCols.map(col): _*)
    val srcPayload = graft.read.SnapshotReader.read(spark, src)
      .select(payloadCols.map(col): _*)
    assert(dstPayload.exceptAll(srcPayload).isEmpty &&
      srcPayload.exceptAll(dstPayload).isEmpty)
  }
}

import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("streaming-spec").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** File streaming sources require a directory: stage the events parquet
    * into one. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("file-stream hourly agg equals batch hourly agg") {
    val batch = EventStream.hourlyAgg(
      spark.read.parquet(s"$sf/events.parquet"))
      .orderBy("event_type", "hour_start").collect()

    val q = EventStream.hourlyAgg(EventStream.readStream(spark, eventsDir))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly")
      .orderBy("event_type", "hour_start").collect()

    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }

  test("session_window agg runs on a stream and matches batch totals") {
    val batch = EventStream.sessionAgg(
      spark.read.parquet(s"$sf/events.parquet"))
    val batchTotal = batch.agg(sum("n_events")).head.getLong(0)

    val q = EventStream.sessionAgg(EventStream.readStream(spark, eventsDir))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamedTotal = spark.table("sessions")
      .agg(sum("n_events")).head.getLong(0)

    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(batchTotal == nEvents)
    assert(streamedTotal == nEvents)
  }

  test("stream-stream interval join matches its batch twin") {
    val batch = EventStream.clickViewJoin(
      spark.read.parquet(s"$sf/events.parquet")).count()
    val q = EventStream.clickViewJoin(
        EventStream.readStream(spark, eventsDir))
      .writeStream.format("memory").queryName("cv_join")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("cv_join").count()
    assert(batch > 0, "batch twin must find click-view pairs")
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }

  test("streaming dedup drops duplicate arrivals with bounded state") {
    // duplicate the whole input: copy events.parquet twice into the source
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("b.parquet"))
    val q = EventStream.dedupStream(
        EventStream.readStream(spark, dir.toString))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val n = spark.table("deduped").count()
    val distinct = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_id").distinct().count()
    assert(n == distinct, s"expected $distinct deduped rows, got $n")
  }

  test("stateful sessionization: batch flush matches window-lag oracle") {
    import spark.implicits._
    val events = EventStream.tsNanos(spark.read.parquet(s"$sf/events.parquet"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val sessions = EventStream.sessionizeStateful(spark, events, gapSec = 1800L)
    // oracle: n_sessions per user via lag() (same logic as q_events_sessions)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc)
    val oracle = EventStream.tsNanos(spark.read.parquet(s"$sf/events.parquet"))
      .withColumn("sec", (col("ts") / lit(1000000000L)).cast("long"))
      .withColumn("prev", lag("sec", 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("sec") - col("prev") > 1800, 1L).otherwise(0L))
      .groupBy("user_id").agg(sum("ns").as("n_sessions"))
    val got = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
    val diff = got.join(oracle, Seq("user_id"))
      .filter(got("n_sessions") =!= oracle("n_sessions")).count()
    assert(diff == 0)
    // event conservation: every event lands in exactly one session
    val total = sessions.agg(sum("n_events")).head.getLong(0)
    assert(total == events.count())
  }

  test("streaming stateful sessionization closes sessions via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val nanos = (s: Long) => s * 1000000000L
    // user 1: two events 10s apart (one session), then a third past the gap
    mem.addData(
      EventStream.Event(1L, nanos(100), 1L, "c", 1.0),
      EventStream.Event(2L, nanos(110), 1L, "c", 2.0))
    // keep event_time in the plan: it carries the watermark the
    // event-time timeout needs (.as[Event] tolerates the extra column)
    val withTime = EventStream.withEventTime(mem.toDF())
      .withWatermark("event_time", "0 seconds")
      .as[EventStream.Event]
    val q = EventStream.sessionizeStateful(spark, withTime,
        gapSec = 60L, flushOpen = false)
      .writeStream.format("memory").queryName("stateful_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // nothing closed yet: watermark at 110, session open until 170
      assert(spark.table("stateful_sessions").count() == 0)
      // an event far past the gap advances the watermark → closes session 1
      mem.addData(EventStream.Event(3L, nanos(1000), 1L, "c", 3.0))
      q.processAllAvailable()
      mem.addData(EventStream.Event(4L, nanos(2000), 2L, "c", 0.0))
      q.processAllAvailable()
      val closed = spark.table("stateful_sessions")
        .orderBy("session_start_sec").collect()
      assert(closed.length >= 1)
      val first = closed.head
      assert(first.getAs[Long]("session_start_sec") == 100L)
      assert(first.getAs[Long]("session_end_sec") == 110L)
      assert(first.getAs[Long]("n_events") == 2L)
      assert(first.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }
}
