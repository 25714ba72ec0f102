package graft

import graft.read.ChangeFeed
import graft.views.MaterializedAgg
import graft.write.CowWriter
import org.apache.spark.sql.functions._

/** Change-feed pre-images and the incrementally maintained materialized
  * aggregate built on them. */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  private val C1 = "20260101000000"
  private val C2 = "20260102000000"
  private val C3 = "20260103000000"

  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .limit(300)

  /** src table: C1 insert, C2 update %10==3 (+100000), C3 delete %7==0. */
  private def buildSrc(dir: String): Unit = {
    val w = new CowWriter(spark, dir, numBuckets = 4)
    val k = col("o_orderkey")
    w.insert(orders, k, col("o_orderstatus"), C1)
    w.upsert(orders.filter(k % 10 === 3)
      .withColumn("o_totalprice", col("o_totalprice") + 100000),
      k, col("o_orderstatus"), C2)
    w.delete(orders.filter(k % 7 === 0), k, col("o_orderstatus"), C3)
  }

  test("change feed preImages: one full pre-commit row per surviving " +
    "update, restamped to the updating commit; plain mode unchanged") {
    val dir = freshDir("cf_preimages")
    buildSrc(dir)
    val ch = ChangeFeed.read(spark, dir, C1, C2, preImages = true)
    val updates = ch.filter(col(ChangeFeed.ChangeType) === "update")
    val pres = ch.filter(col(ChangeFeed.ChangeType) === "update_preimage")
    assert(updates.count() > 0 && pres.count() == updates.count())
    // pre-image payload is the C1 value; post-image carries the +100000
    val joined = updates.select(col("o_orderkey").as("k"),
        col("o_totalprice").as("post"))
      .join(pres.select(col("o_orderkey").as("k"),
        col("o_totalprice").as("pre")), "k")
    assert(joined.filter(col("post") =!= col("pre") + 100000).count() == 0)
    // restamp: pre-images carry the UPDATING commit's ts
    assert(pres.filter(col(ChangeFeed.ChangeCommitTs) =!= C2).count() == 0)
    // plain mode emits no pre-images and is otherwise identical
    val plain = ChangeFeed.read(spark, dir, C1, C2)
    assert(plain.filter(col(ChangeFeed.ChangeType) === "update_preimage")
      .count() == 0)
    assert(plain.count() == ch.count() - pres.count())
    // format surface: cdcPreImages rides the cdc option
    val viaFmt = spark.read.format("graft").option("from", C1)
      .option("to", C2).option("cdc", "true")
      .option("cdcPreImages", "true").load(dir)
    assert(viaFmt.filter(col(ChangeFeed.ChangeType) === "update_preimage")
      .count() == pres.count())
    val badOpt = intercept[Exception] {
      spark.read.format("graft").option("from", C1)
        .option("cdcPreImages", "true").load(dir)
    }
    assert(badOpt.getMessage.contains("cdcPreImages"))
  }

  test("materialized agg: bootstrap + two incremental refreshes track the " +
    "snapshot GROUP BY exactly; idempotent when nothing changed") {
    val dir = freshDir("matview")
    val src = s"$dir/src"; val view = s"$dir/view"
    val w = new CowWriter(spark, src, numBuckets = 4)
    val k = col("o_orderkey")
    val cents = round(col("o_totalprice") * 100).cast("long")
    def expected() = SnapshotReader_read(src)
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_rows"), sum(cents).as("sum_val"))
    def viewPayload() = MaterializedAgg.read(spark, view)
      .select("o_custkey", "n_rows", "sum_val")
    def assertInSync(): Unit = {
      val e = expected(); val v = viewPayload()
      assert(v.exceptAll(e).isEmpty && e.exceptAll(v).isEmpty)
    }
    w.insert(orders, k, col("o_orderstatus"), C1)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents,
      buckets = 2)
    assertInSync()
    // incremental: updates need pre-images to subtract the old value
    w.upsert(orders.filter(k % 10 === 3)
      .withColumn("o_totalprice", col("o_totalprice") + 100000),
      k, col("o_orderstatus"), C2)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents)
    assertInSync()
    // deletes can empty a group: its row leaves the view
    w.delete(orders.filter(k % 7 === 0), k, col("o_orderstatus"), C3)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents)
    assertInSync()
    val vanished = orders.filter(k % 7 === 0).select("o_custkey")
      .except(orders.filter(k % 7 =!= 0).select("o_custkey")).count()
    if (vanished > 0) // groups whose every order was deleted
      assert(MaterializedAgg.read(spark, view).count() ==
        orders.filter(k % 7 =!= 0).select("o_custkey").distinct().count())
    // idempotent: a refresh with no new source commits mints NO view commit
    val tl = graft.format.Timeline(spark.sessionState.newHadoopConf(), view)
    val before = tl.completedInstants().size
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents)
    tl.refresh()
    assert(tl.completedInstants().size == before)
  }

  test("materialized agg: NULL measure values contribute 0 in bootstrap " +
    "AND in the incremental fold (no sum poisoning)") {
    val dir = freshDir("matview_null")
    val src = s"$dir/src"; val view = s"$dir/view"
    val k = col("o_orderkey")
    // measure is NULL for every third order — from the first commit on
    val cents = when(k % 3 === 0, lit(null))
      .otherwise(round(col("o_totalprice") * 100)).cast("long")
    val w = new CowWriter(spark, src, numBuckets = 4)
    w.insert(orders, k, col("o_orderstatus"), C1)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents,
      buckets = 2)
    def expected() = SnapshotReader_read(src)
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(cents, lit(0L))).as("sum_val"))
    def assertInSync(): Unit = {
      val e = expected()
      val v = MaterializedAgg.read(spark, view)
        .select("o_custkey", "n_rows", "sum_val")
      assert(v.exceptAll(e).isEmpty && e.exceptAll(v).isEmpty)
      assert(v.filter(col("sum_val").isNull).count() == 0,
        "a NULL measure must never poison a maintained sum")
    }
    assertInSync()
    // incremental: an UPDATE that nulls a previously non-null measure
    // (delta = 0 - old) and an update that un-nulls one (delta = new - 0)
    w.upsert(orders.filter(k % 10 === 3)
      .withColumn("o_orderkey", k + 1000000) // new keys into old groups
      .withColumn("o_totalprice", lit(null).cast("double")),
      col("o_orderkey"), col("o_orderstatus"), C2)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents)
    assertInSync()
    w.upsert(orders.filter(k % 3 === 0) // null -> stays null measure rows
      .withColumn("o_totalprice", col("o_totalprice") + 5),
      k, col("o_orderstatus"), C3)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents)
    assertInSync()
  }

  test("materialized agg on a MOR source: delta commits and a silent " +
    "compaction refresh exactly") {
    val dir = freshDir("matview_mor")
    val src = s"$dir/src"; val view = s"$dir/view"
    val cents = round(col("o_totalprice") * 100).cast("long")
    val k = col("o_orderkey")
    val w = new graft.write.MorWriter(spark, src, numBuckets = 4)
    w.insert(orders, k, col("o_orderstatus"), C1)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents,
      buckets = 2)
    // one delta commit carrying updates AND deletes
    w.upsertDelta(
      updates = Some(orders.filter(k % 10 === 3 && k % 7 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100000)),
      deletes = Some(orders.filter(k % 7 === 0)),
      k, col("o_orderstatus"), C2)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents)
    def assertInSync(): Unit = {
      val e = graft.read.SnapshotReader.read(spark, src)
        .filter(col("o_custkey").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_rows"), sum(cents).as("sum_val"))
      val v = MaterializedAgg.read(spark, view)
        .select("o_custkey", "n_rows", "sum_val")
      assert(v.exceptAll(e).isEmpty && e.exceptAll(v).isEmpty)
    }
    assertInSync()
    // compaction rewrites bytes, not rows: the refresh after it must be a
    // no-op commit-wise (CDC is silent on layout commits)
    w.compact(C3)
    val tl = graft.format.Timeline(spark.sessionState.newHadoopConf(), view)
    val before = tl.completedInstants().size
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents)
    tl.refresh()
    assert(tl.completedInstants().size == before,
      "a layout-only source commit must not mint a view commit")
    assertInSync()
  }

  test("materialized extrema: min/max maintained under retractions — " +
    "only extremum-retracting groups recompute; idempotent; groups vanish") {
    import graft.views.MaterializedExtrema
    val dir = freshDir("matview_minmax")
    val src = s"$dir/src"; val view = s"$dir/view"
    val k = col("o_orderkey")
    val cents = round(col("o_totalprice") * 100).cast("long")
    val w = new CowWriter(spark, src, numBuckets = 4)
    def expected() = SnapshotReader_read(src)
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_rows"), min(cents).as("min_val"),
        max(cents).as("max_val"))
    def assertInSync(): Unit = {
      val e = expected()
      val v = MaterializedExtrema.read(spark, view)
        .select("o_custkey", "n_rows", "min_val", "max_val")
      assert(v.exceptAll(e).isEmpty && e.exceptAll(v).isEmpty)
    }
    w.insert(orders, k, col("o_orderstatus"), C1)
    MaterializedExtrema.refresh(spark, src, view, "o_custkey", cents,
      buckets = 2)
    assertInSync()
    // updates move values both ways: some become new maxima (fast path),
    // the pre-image retraction of an old extremum forces that group's
    // re-aggregation (recompute path) — both folds must stay exact
    w.upsert(orders.filter(k % 10 === 3)
      .withColumn("o_totalprice", col("o_totalprice") + 100000),
      k, col("o_orderstatus"), C2)
    MaterializedExtrema.refresh(spark, src, view, "o_custkey", cents)
    assertInSync()
    // delete-heavy history: half the rows go, retracting many extrema;
    // groups emptied entirely must leave the view
    w.delete(orders.filter(k % 2 === 0), k, col("o_orderstatus"), C3)
    MaterializedExtrema.refresh(spark, src, view, "o_custkey", cents)
    assertInSync()
    val live = orders.filter(k % 2 =!= 0).filter(col("o_custkey").isNotNull)
      .select("o_custkey").distinct().count()
    assert(MaterializedExtrema.read(spark, view).count() == live,
      "emptied groups must vanish from the view")
    // idempotent: nothing new → no view commit
    val tl = graft.format.Timeline(spark.sessionState.newHadoopConf(), view)
    val before = tl.completedInstants().size
    MaterializedExtrema.refresh(spark, src, view, "o_custkey", cents)
    tl.refresh()
    assert(tl.completedInstants().size == before)
    // structural commit (overwrite) → recompute fallback stays exact
    val replacement = orders.filter(k % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 7)
    w.overwriteTable(replacement, k, col("o_orderstatus"), "20260104000000")
    MaterializedExtrema.refresh(spark, src, view, "o_custkey", cents)
    assertInSync()
  }

  test("materialized top-k: per-group k-largest maintained under " +
    "retractions; exploded read matches a row_number oracle shape") {
    import graft.views.MaterializedTopK
    val dir = freshDir("matview_topk")
    val src = s"$dir/src"; val view = s"$dir/view"
    val k = col("o_orderkey")
    val cents = round(col("o_totalprice") * 100).cast("long")
    val K = 3
    val w = new CowWriter(spark, src, numBuckets = 4)
    def expected() = {
      val base = SnapshotReader_read(src)
        .filter(col("o_custkey").isNotNull && cents.isNotNull)
        .select(col("o_custkey"), cents.as("val"))
      base.withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_custkey")).orderBy(col("val").desc)))
        .filter(col("rnk") <= K)
        .select("o_custkey", "rnk", "val")
    }
    def assertInSync(): Unit = {
      val e = expected()
      val v = MaterializedTopK.readExploded(spark, view)
        .select("o_custkey", "rnk", "val")
      assert(v.exceptAll(e).isEmpty && e.exceptAll(v).isEmpty)
    }
    w.insert(orders, k, col("o_orderstatus"), C1)
    MaterializedTopK.refresh(spark, src, view, "o_custkey", cents, K,
      buckets = 2)
    assertInSync()
    // push some values up (fast-path inserts + pre-image retractions that
    // may evict list members) …
    w.upsert(orders.filter(k % 10 === 3)
      .withColumn("o_totalprice", col("o_totalprice") + 100000),
      k, col("o_orderstatus"), C2)
    MaterializedTopK.refresh(spark, src, view, "o_custkey", cents, K)
    assertInSync()
    // … then a delete-heavy commit retracting many listed values
    w.delete(orders.filter(k % 2 === 0), k, col("o_orderstatus"), C3)
    MaterializedTopK.refresh(spark, src, view, "o_custkey", cents, K)
    assertInSync()
    // idempotence
    val tl = graft.format.Timeline(spark.sessionState.newHadoopConf(), view)
    val before = tl.completedInstants().size
    MaterializedTopK.refresh(spark, src, view, "o_custkey", cents, K)
    tl.refresh()
    assert(tl.completedInstants().size == before)
  }

  test("materialized agg: a structural commit (overwrite) in the range " +
    "triggers the recompute path and stays exact") {
    val dir = freshDir("matview_ow")
    val src = s"$dir/src"; val view = s"$dir/view"
    val cents = round(col("o_totalprice") * 100).cast("long")
    val k = col("o_orderkey")
    val w = new CowWriter(spark, src, numBuckets = 4)
    w.insert(orders, k, col("o_orderstatus"), C1)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents,
      buckets = 2)
    // overwrite replaces the table with a disjoint-ish subset: CDC does
    // not enumerate the dropped rows, so refresh must recompute
    val replacement = orders.filter(k % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 7)
    w.overwriteTable(replacement, k, col("o_orderstatus"), C2)
    MaterializedAgg.refresh(spark, src, view, "o_custkey", cents)
    val e = replacement.filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_rows"), sum(cents).as("sum_val"))
    val v = MaterializedAgg.read(spark, view)
      .select("o_custkey", "n_rows", "sum_val")
    assert(v.exceptAll(e).isEmpty && e.exceptAll(v).isEmpty)
  }

  test("streaming view maintenance: a table tail drives refresh per " +
    "micro-batch and the view tracks the source") {
    val dir = freshDir("matview_stream")
    val src = s"$dir/src"; val view = s"$dir/view"
    val cents = round(col("o_totalprice") * 100).cast("long")
    val k = col("o_orderkey")
    val w = new CowWriter(spark, src, numBuckets = 4)
    w.insert(orders, k, col("o_orderstatus"), C1)
    def drain(): Unit = {
      // tail the source's commit stream; each micro-batch triggers ONE
      // refresh (the batch content is the trigger — refresh itself reads
      // the CDC range, so the pipeline is exactly-once by the view's
      // recorded srcAsOf regardless of batch boundaries)
      val q = spark.readStream.format("graft").load(src)
        .writeStream
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          MaterializedAgg.refresh(spark, src, view, "o_custkey", cents,
            buckets = 2): Unit
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    drain()
    def assertInSync(): Unit = {
      val e = SnapshotReader_read(src).filter(col("o_custkey").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_rows"), sum(cents).as("sum_val"))
      val v = MaterializedAgg.read(spark, view)
        .select("o_custkey", "n_rows", "sum_val")
      assert(v.exceptAll(e).isEmpty && e.exceptAll(v).isEmpty)
    }
    assertInSync()
    // more source commits; the restarted stream catches up from its
    // checkpoint and the refreshes fold the new range
    w.upsert(orders.filter(k % 10 === 3)
      .withColumn("o_totalprice", col("o_totalprice") + 100000),
      k, col("o_orderstatus"), C2)
    w.delete(orders.filter(k % 7 === 0), k, col("o_orderstatus"), C3)
    drain()
    assertInSync()
  }

  private def SnapshotReader_read(path: String) =
    graft.read.SnapshotReader.read(spark, path)

  test("materialized distinct: exact per-group distinct count maintained " +
    "under inserts (bitmap-union fast path) and retractions (recompute)") {
    import graft.views.MaterializedDistinct
    val dir = freshDir("matview_distinct")
    val src = s"$dir/src"; val view = s"$dir/view"
    val k = col("o_orderkey")
    val w = new CowWriter(spark, src, numBuckets = 4)
    def expected() = SnapshotReader_read(src)
      .filter(col("o_orderpriority").isNotNull)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_distinct"))
    def assertInSync(): Unit = {
      val e = expected()
      val v = MaterializedDistinct.read(spark, view)
        .select("o_orderpriority", "n_rows", "n_distinct")
      assert(v.exceptAll(e).isEmpty && e.exceptAll(v).isEmpty)
    }
    def refresh(): Unit = MaterializedDistinct.refresh(spark, src, view,
      "o_orderpriority", col("o_custkey"), buckets = 2): Unit

    w.insert(orders, k, col("o_orderstatus"), C1)
    refresh(); assertInSync()
    // insert-ONLY commit under new keys, some custkeys already present:
    // the zero-source-IO union path, idempotent re-insertion included
    w.upsert(orders.filter(k % 5 === 1)
      .withColumn("o_orderkey", k + 1000000000L),
      col("o_orderkey"), col("o_orderstatus"), C2)
    refresh(); assertInSync()
    // retractions: updates move custkeys, deletes drop rows — affected
    // groups re-aggregate from the group-filtered source
    w.delete(orders.filter(k % 2 === 0), k, col("o_orderstatus"), C3)
    refresh(); assertInSync()
    // idempotent: nothing new → no view commit
    val tl = graft.format.Timeline(spark.sessionState.newHadoopConf(), view)
    val before = tl.completedInstants().size
    refresh()
    tl.refresh()
    assert(tl.completedInstants().size == before)
    // value-preserving churn: an upsert touching only a column the view
    // does not track recomputes the affected groups to IDENTICAL rows —
    // the canonical-bytes diff drops them all and no commit is minted
    w.upsert(orders.filter(k % 2 =!= 0 && k % 9 === 1)
        .withColumn("o_totalprice", $"o_totalprice" + 1),
      k, col("o_orderstatus"), "20260103120000")
    refresh()
    tl.refresh()
    assert(tl.completedInstants().size == before,
      "a view-invisible source change must not mint a view commit")
    assertInSync()
    // structural commit → recompute fallback, canonical-bytes diff
    val replacement = orders.filter(k % 3 === 0)
    w.overwriteTable(replacement, k, col("o_orderstatus"), "20260104000000")
    refresh(); assertInSync()
    // stored bitmap is the canonical serialization of the live value set
    import graft.functions.Bitmap64
    val row = MaterializedDistinct.read(spark, view)
      .orderBy(col("o_orderpriority")).select("o_orderpriority", "bm")
      .head()
    val liveVals = SnapshotReader_read(src)
      .filter(col("o_orderpriority") === row.getString(0) &&
        col("o_custkey").isNotNull)
      .select(col("o_custkey")).distinct()
      .as[Long].collect()
    val bm = Bitmap64.empty()
    liveVals.foreach(Bitmap64.add(bm, _))
    assert(java.util.Arrays.equals(
      Bitmap64.serialize(bm), row.getAs[Array[Byte]](1)))
  }
}
