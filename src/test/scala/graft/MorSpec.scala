package graft

import graft.format._
import graft.read.{IncrementalReader, SnapshotReader}
import graft.write.MorWriter
import org.apache.spark.sql.functions._

/** MOR table lifecycle: insert → delta upsert/delete → snapshot merge →
  * time travel → incremental → compaction (SURVEY.md §7.2 step 4; north-star
  * "Spark + Hudi MergeOnRead reader" per BASELINE.json).
  */
class MorSpec extends SparkSpec {
  import spark.implicits._

  private val C1 = "20260101000000"
  private val C2 = "20260102000000"
  private val C3 = "20260103000000"
  private val C4 = "20260104000000"

  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")
  private def keyCol = col("o_orderkey")
  private def partCol = col("o_orderstatus")

  /** C1: insert all; C2: delta-delete %7==0 and delta-update %10==3 (+1e5);
    * C3: compaction; C4: delta-delete %11==5 of survivors. */
  private lazy val base: String = {
    val dir = freshDir("orders_mor")
    val w = new MorWriter(spark, dir, numBuckets = 4)
    w.insert(orders, keyCol, partCol, C1)
    w.upsertDelta(
      updates = Some(orders.filter($"o_orderkey" % 10 === 3 && $"o_orderkey" % 7 =!= 0)
        .withColumn("o_totalprice", $"o_totalprice" + 100000)),
      deletes = Some(orders.filter($"o_orderkey" % 7 === 0)),
      keyCol, partCol, C2)
    w.compact(C3)
    w.upsertDelta(None,
      Some(orders.filter($"o_orderkey" % 11 === 5 && $"o_orderkey" % 7 =!= 0)),
      keyCol, partCol, C4)
    dir
  }

  private def expectedAfterC2 = orders
    .filter($"o_orderkey" % 7 =!= 0)
    .withColumn("o_totalprice",
      when($"o_orderkey" % 10 === 3, $"o_totalprice" + 100000)
        .otherwise($"o_totalprice"))

  test("snapshot after delta commit merges base + deltas") {
    val snap = SnapshotReader.read(spark, base, asOf = Some(C2))
      .select(orders.columns.map(col).toIndexedSeq: _*)
    val exp = expectedAfterC2
    assert(snap.count() == exp.count())
    assert(snap.exceptAll(exp).isEmpty && exp.exceptAll(snap).isEmpty)
  }

  test("merge keyFilter: key-restricted merge == full merge filtered, " +
      "with the restriction pushed below the window (r17)") {
    // the existence-probe pushdown (MorWriter's exact op counters):
    // keyed merge must agree with post-filtering the full snapshot for
    // every key class — live, updated, deleted (absent), never-written
    // (absent) — across base+delta AND post-compaction states
    val tl = Timeline(spark.sessionState.newHadoopConf(), base)
    val slices = tl.latestSlices(None).values.toSeq
    val probeKeys = Seq(
      orders.filter($"o_orderkey" % 7 === 0).limit(5),   // deleted at C2
      orders.filter($"o_orderkey" % 10 === 3 &&
        $"o_orderkey" % 7 =!= 0).limit(5),               // updated
      orders.filter($"o_orderkey" % 7 === 1).limit(5))   // untouched
      .map(_.select($"o_orderkey".cast("string")
        .as(MetaCols.RecordKey)))
      .reduce(_ unionByName _)
      .unionByName(Seq("99999999").toDF(MetaCols.RecordKey)) // never written
    val keyed = SnapshotReader.merge(spark, base, slices,
        keyFilter = Some(probeKeys))
      .select(col(MetaCols.RecordKey))
    val full = SnapshotReader.merge(spark, base, slices)
      .select(col(MetaCols.RecordKey))
      .join(broadcast(probeKeys), Seq(MetaCols.RecordKey), "left_semi")
    assert(keyed.exceptAll(full).isEmpty && full.exceptAll(keyed).isEmpty,
      "keyed merge must equal full-merge-then-filter")
    // deleted + never-written keys are ABSENT (the existence contract)
    val got = keyed.as[String].collect().toSet
    assert(!got.contains("99999999"))
    assert(orders.filter($"o_orderkey" % 7 === 0).limit(5)
      .select($"o_orderkey".cast("string")).as[String].collect()
      .forall(k => !got.contains(k)),
      "a delta-deleted key must read as absent through the keyed merge")
  }

  test("delta commit records exact delete counts") {
    val tl = Timeline(spark.sessionState.newHadoopConf(), base)
    assert(tl.instantAt(C2).get.action == Instant.DeltaCommitAction)
    assert(tl.metadata(C2).totalRecordsDeleted ==
      orders.filter($"o_orderkey" % 7 === 0).count())
  }

  test("delta commit records exact update counts (existing keys only)") {
    val tl = Timeline(spark.sessionState.newHadoopConf(), base)
    val updates = tl.metadata(C2).allStats.map(_._2.numUpdateWrites).sum
    assert(updates ==
      orders.filter($"o_orderkey" % 10 === 3 && $"o_orderkey" % 7 =!= 0).count())
  }

  test("history: one row per instant with actions and exact row counters") {
    val h = sources.GraftTable(spark, base).history.collect()
    assert(h.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      C1 -> Instant.CommitAction, C2 -> Instant.DeltaCommitAction,
      C3 -> Instant.CommitAction, C4 -> Instant.DeltaCommitAction))
    val byTs = h.map(r => r.getString(0) -> r).toMap
    assert(byTs(C2).getAs[Long]("n_deleted") ==
      orders.filter($"o_orderkey" % 7 === 0).count())
    assert(byTs(C2).getAs[Long]("n_updated") ==
      orders.filter($"o_orderkey" % 10 === 3 && $"o_orderkey" % 7 =!= 0)
        .count())
    assert(byTs(C1).getAs[Long]("n_inserted") == orders.count())
    assert(byTs(C3).getAs[Long]("n_deleted") == 0) // compaction is silent
  }

  test("compaction folds deltas; snapshot unchanged; slices reset") {
    val tl = Timeline(spark.sessionState.newHadoopConf(), base)
    val afterC3 = tl.latestSlices(Some(C3))
    assert(afterC3.values.forall(_.deltas.isEmpty), "compaction clears deltas")
    val snap = SnapshotReader.read(spark, base, asOf = Some(C3))
      .select(orders.columns.map(col).toIndexedSeq: _*)
    val exp = expectedAfterC2
    assert(snap.count() == exp.count())
    assert(snap.exceptAll(exp).isEmpty && exp.exceptAll(snap).isEmpty)
  }

  test("snapshot at head reflects post-compaction delta delete") {
    val snap = SnapshotReader.read(spark, base)
    val exp = expectedAfterC2.filter($"o_orderkey" % 11 =!= 5)
    assert(snap.count() == exp.count())
  }

  test("time travel to C1 sees original inserts only") {
    val snap = SnapshotReader.read(spark, base, asOf = Some(C1))
    assert(snap.count() == orders.count())
    assert(snap.select(MetaCols.CommitTime).distinct()
      .as[String].collect().toSeq == Seq(C1))
  }

  test("same key updated AND deleted in one commit: delete wins, deterministically") {
    val dir = freshDir("orders_mor_tie")
    val w = new MorWriter(spark, dir, numBuckets = 2)
    w.insert(orders, keyCol, partCol, C1)
    // overlap: %10==3 ∩ %7==0 keys get both an upsert and a delete marker
    w.upsertDelta(
      updates = Some(orders.filter($"o_orderkey" % 10 === 3)
        .withColumn("o_totalprice", $"o_totalprice" + 100000)),
      deletes = Some(orders.filter($"o_orderkey" % 7 === 0)),
      keyCol, partCol, C2)
    val snap = SnapshotReader.read(spark, dir)
    assert(snap.count() == orders.filter($"o_orderkey" % 7 =!= 0).count())
    assert(snap.filter($"o_orderkey" % 7 === 0).isEmpty)
  }

  test("threshold compaction rewrites only groups at/over the delta threshold") {
    val dir = freshDir("orders_mor_compactif")
    val w = new MorWriter(spark, dir, numBuckets = 4)
    w.insert(orders, keyCol, partCol, C1)
    // C2 touches everything (one delta per group); C3 touches ONE key
    w.upsertDelta(Some(orders.withColumn("o_totalprice", $"o_totalprice" + 1)),
      None, keyCol, partCol, C2)
    val one = orders.orderBy($"o_orderkey").limit(1)
    w.upsertDelta(Some(one.withColumn("o_totalprice", $"o_totalprice" + 2)),
      None, keyCol, partCol, C3)
    val before = Timeline(spark.sessionState.newHadoopConf(), dir)
      .latestSlices(None)
    val hot = before.values.filter(_.deltas.size >= 2).map(_.fileId).toSet
    assert(hot.size == 1, "exactly one group should carry two deltas")
    w.compactIf(C4, minDeltas = 2)
    val after = Timeline(spark.sessionState.newHadoopConf(), dir)
      .latestSlices(None)
    assert(after(hot.head).deltas.isEmpty &&
      after(hot.head).commitTs == C4, "hot group compacted")
    after.values.filterNot(s => hot(s.fileId)).foreach { s =>
      assert(s.deltas.size == 1 && s.commitTs != C4,
        s"cold group ${s.fileId} must be untouched")
    }
    // data unchanged by compaction
    val snap = SnapshotReader.read(spark, dir)
    assert(snap.count() == orders.count())
    assert(snap.filter($"o_totalprice" % 10 === 0).count() ==
      SnapshotReader.read(spark, dir, Some(C3))
        .filter($"o_totalprice" % 10 === 0).count())
  }

  test("MOR delete view: delta-delete markers resolve to full pre-commit rows") {
    val dv = graft.deleteview.DeleteView(spark, base, C2).toDF()
    val expected = orders.filter($"o_orderkey" % 7 === 0)
    assert(dv.count() == expected.count())
    // full old payloads, restamped to the deleting commit
    assert(dv.select(MetaCols.CommitTime).distinct()
      .as[String].collect().toSeq == Seq(C2))
    val got = dv.select(orders.columns.map(col).toIndexedSeq: _*)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // post-compaction delta delete (C4): markers resolve against the
    // compacted slices, payloads carry the C2 update
    val dv4 = graft.deleteview.DeleteView(spark, base, C4).toDF()
    val exp4 = expectedAfterC2.filter($"o_orderkey" % 11 === 5)
    assert(dv4.count() == exp4.count())
    val got4 = dv4.select(orders.columns.map(col).toIndexedSeq: _*)
    assert(got4.exceptAll(exp4).isEmpty && exp4.exceptAll(got4).isEmpty)
  }

  test("incremental plans ONLY file groups written in the commit range") {
    val dir = freshDir("orders_mor_prune")
    val w = new MorWriter(spark, dir, numBuckets = 4)
    w.insert(orders, keyCol, partCol, C1)
    // touch exactly one record → exactly one file group dirty in (C1, C2]
    val one = orders.orderBy($"o_orderkey").limit(1)
    w.upsertDelta(
      Some(one.withColumn("o_totalprice", $"o_totalprice" + 5)), None,
      keyCol, partCol, C2)
    val inc = IncrementalReader.read(spark, dir, C1, C2)
    val touched = Timeline(spark.sessionState.newHadoopConf(), dir)
      .metadata(C2).allStats.map(_._2.fileId).toSet
    assert(touched.size == 1)
    val files = inc.inputFiles.toSeq
    assert(files.nonEmpty)
    assert(files.forall { f =>
      val name = f.substring(f.lastIndexOf('/') + 1)
      touched.exists(fid => name.startsWith(fid + "_"))
    }, s"scan leaked beyond touched groups: $files")
    assert(inc.count() == 1)
  }

  test("partition-pruned snapshot plans only the named partition's files") {
    val part = orders.select(partCol).distinct()
      .as[String].collect().sorted.head
    val snap = SnapshotReader.read(spark, base, partitions = Seq(part))
    val expected = expectedAfterC2
      .filter($"o_orderkey" % 11 =!= 5 && partCol === part)
    assert(snap.count() == expected.count())
    // outstanding deltas → the snapshot is GraftMorRelation-backed (r7
    // format parity); the relation records the files its scan planned
    // (inputFiles is hidden by the V1 RDD)
    val rel = snap.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.read.GraftMorRelation] =>
        l.relation.asInstanceOf[graft.read.GraftMorRelation]
    }.head
    val files = rel.lastPlannedFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains(s"/$part/")),
      s"scan leaked outside partition $part: $files")
  }

  test("incremental over an empty commit range is empty but keeps the schema") {
    val inc = IncrementalReader.read(spark, base, C3, C3)
    assert(inc.isEmpty)
    assert(inc.columns.contains(MetaCols.CommitTime))
    // metadata-first degenerate path: no data file may enter the plan (the
    // schema comes from one slice's footers, not a planned snapshot)
    assert(inc.inputFiles.isEmpty,
      s"empty-range incremental planned data files: ${inc.inputFiles.toSeq}")
    // column parity with a real incremental read of the same table
    assert(inc.columns.sorted.toSeq ==
      IncrementalReader.read(spark, base, C1, C2).columns.sorted.toSeq)
  }

  test("incremental (C1, C2] returns exactly the C2 upserts") {
    val inc = IncrementalReader.read(spark, base, C1, C2)
    val expUpd = orders.filter($"o_orderkey" % 10 === 3 && $"o_orderkey" % 7 =!= 0)
    assert(inc.count() == expUpd.count())
    assert(inc.select(MetaCols.CommitTime).distinct()
      .as[String].collect().toSeq == Seq(C2))
    // updated payloads carried
    assert(inc.filter($"o_totalprice" < 100000).isEmpty)
  }

  test("deltaCounters=off: delete-free deltas skip the exactness marker " +
      "and metadata COUNT declines to a correct scan; deletes still " +
      "count exactly; exact mode keeps the metadata fold") {
    def build(dcOff: Boolean): String = {
      val dir = freshDir(s"orders_dc_${if (dcOff) "off" else "exact"}")
      def write(df: org.apache.spark.sql.DataFrame, ts: String): Unit = {
        val w0 = df.write.format("graft")
          .option("key", "o_orderkey").option("partition", "p")
          .option("type", "mor").option("buckets", "2").option("ts", ts)
          .mode(org.apache.spark.sql.SaveMode.Append)
        (if (dcOff) w0.option("deltaCounters", "off") else w0).save(dir)
      }
      val o = orders.limit(300).withColumn("p", lit("all"))
      write(o.filter($"o_orderkey" % 3 === 0), C1) // insert (base)
      write(o.filter($"o_orderkey" % 3 === 1), C2) // delete-free delta
      write(o.filter($"o_orderkey" % 3 === 2), C4) // delete-free delta
      dir
    }
    val expected = orders.limit(300).count()

    val off = build(dcOff = true)
    val offTl = Timeline(spark.sessionState.newHadoopConf(), off)
    // delta commits carry NO exactness marker (pre-r11 shape) and leave
    // numInserts unrecorded
    val offDeltas = offTl.completedInstants()
      .filter(_.action == Instant.DeltaCommitAction)
    assert(offDeltas.size == 2)
    offDeltas.foreach { i =>
      val md = offTl.metadata(i.ts)
      assert(!md.extra.contains(graft.write.FormatWriter.DeltaCountsKey))
      assert(md.allStats.forall(_._2.numInserts == 0L))
    }
    assert(SnapshotReader.read(spark, off).count() == expected)
    // catalog COUNT(*): the metadata fold DECLINES (no GraftMetaAggScan)
    // but the scan answer is exact
    spark.conf.set("spark.sql.catalog.dcoff",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dcoff.warehouse",
      new java.io.File(off).getParent)
    val name = new java.io.File(off).getName
    val q = spark.sql(s"SELECT count(*) AS n FROM dcoff.`$name`")
    assert(!q.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"),
      "off-mode deltas must decline the metadata COUNT fold")
    assert(q.head().getLong(0) == expected)
    // a DELETE delta still records exact totals (delete-view invariant)
    val w = new MorWriter(spark, off, numBuckets = 2,
      exactCounters = false)
    val dels = orders.limit(300).filter($"o_orderkey" % 5 === 0)
      .withColumn("p", lit("all"))
    val nDel = dels.count()
    w.delete(dels, col("o_orderkey"), col("p"), "20260105000000")
    // fresh Timeline: offTl memoized its instant listing pre-delete
    val delMd = Timeline(spark.sessionState.newHadoopConf(), off)
      .metadata("20260105000000")
    assert(delMd.totalRecordsDeleted == nDel)
    assert(SnapshotReader.read(spark, off).count() == expected - nDel)

    // exact mode on the same script keeps the fold: marker present,
    // GraftMetaAggScan plans, zero file input, same answer
    val ex = build(dcOff = false)
    val exTl = Timeline(spark.sessionState.newHadoopConf(), ex)
    exTl.completedInstants()
      .filter(_.action == Instant.DeltaCommitAction)
      .foreach(i => assert(exTl.metadata(i.ts).extra
        .get(graft.write.FormatWriter.DeltaCountsKey).contains("exact")))
    spark.conf.set("spark.sql.catalog.dcex",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dcex.warehouse",
      new java.io.File(ex).getParent)
    val exName = new java.io.File(ex).getName
    val q2 = spark.sql(s"SELECT count(*) AS n FROM dcex.`$exName`")
    assert(q2.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"),
      "exact-mode deltas must keep the metadata COUNT fold")
    assert(q2.head().getLong(0) == expected)
    assert(q2.inputFiles.isEmpty)
  }
}
