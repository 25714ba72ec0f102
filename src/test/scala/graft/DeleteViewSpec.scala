package graft

import graft.deleteview.DeleteView
import graft.format._
import graft.write.CowWriter
import org.apache.spark.sql.functions._

/** End-to-end: build a multi-commit COW table from sf0.001 orders (o_orderkey
  * is table-unique), then assert the delete view reconstructs exactly the
  * deleted rows (the t1 minimum slice from SURVEY.md §7.2 step 3).
  */
class DeleteViewSpec extends SparkSpec {
  import spark.implicits._

  private val C1 = "20260101000000"
  private val C2 = "20260102000000"
  private val C3 = "20260103000000"
  private val C4 = "20260104000000"

  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")
  private def keyCol = col("o_orderkey")
  private def partCol = col("o_orderstatus")

  /** C1: insert all; C2: delete o_orderkey%7==0; C3: update totalprice+=100000
    * where o_orderkey%10==3 (surviving keys only); C4: delete o_orderkey%11==5
    * (surviving keys only). */
  private lazy val base: String = {
    val dir = freshDir("orders_cow")
    val w = new CowWriter(spark, dir, numBuckets = 4)
    w.insert(orders, keyCol, partCol, C1)
    w.delete(orders.filter($"o_orderkey" % 7 === 0), keyCol, partCol, C2)
    w.upsert(
      orders.filter($"o_orderkey" % 10 === 3 && $"o_orderkey" % 7 =!= 0)
        .withColumn("o_totalprice", $"o_totalprice" + 100000),
      keyCol, partCol, C3)
    w.delete(
      orders.filter($"o_orderkey" % 11 === 5 && $"o_orderkey" % 7 =!= 0),
      keyCol, partCol, C4)
    dir
  }

  test("commit metadata records exact delete counts") {
    val tl = Timeline(spark.sessionState.newHadoopConf(), base)
    val expectedC2 = orders.filter($"o_orderkey" % 7 === 0).count()
    assert(tl.metadata(C2).totalRecordsDeleted == expectedC2)
    assert(tl.metadata(C1).totalRecordsDeleted == 0)
    assert(tl.metadata(C3).totalRecordsDeleted == 0)
    val c3 = tl.metadata(C3)
    assert(c3.allStats.forall(_._2.prevCommit.isDefined))
  }

  test("delete view at C2 returns exactly the deleted rows, restamped") {
    val dv = DeleteView(spark, base, C2).toDF()
    val expected = orders.filter($"o_orderkey" % 7 === 0)
    assert(dv.count() == expected.count())
    // payload equality (full rows, original values)
    val payloadCols = orders.columns.toSeq
    val got = dv.select(payloadCols.map(col): _*)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // restamp contract: every row carries the deleting commit's ts
    assert(dv.select(MetaCols.CommitTime).distinct().as[String].collect().toSeq == Seq(C2))
    // keys + partition paths intact
    assert(dv.filter(col(MetaCols.PartitionPath) =!= col("o_orderstatus")).isEmpty)
    assert(dv.filter(col(MetaCols.RecordKey) =!= $"o_orderkey".cast("string")).isEmpty)
  }

  test("delete view at C4 reflects prior updates (C3) in deleted payloads") {
    val dv = DeleteView(spark, base, C4).toDF()
    val expected = orders
      .filter($"o_orderkey" % 11 === 5 && $"o_orderkey" % 7 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 10 === 3, $"o_totalprice" + 100000)
          .otherwise($"o_totalprice"))
    assert(dv.count() == expected.count())
    val got = dv.select(orders.columns.map(col).toIndexedSeq: _*)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("cache: second query serves materialization; corrupt cache self-heals") {
    val view = DeleteView(spark, base, C2)
    view.toDF().count() // ensure materialized
    assert(view.cacheValid())
    // corrupt: remove one parquet file from the cache dir
    val p = new org.apache.hadoop.fs.Path(view.cachePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val f = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).head
    fs.delete(f.getPath, false)
    assert(!view.cacheValid())
    // re-query recomputes and heals
    val healed = DeleteView(spark, base, C2).toDF()
    assert(healed.count() == orders.filter($"o_orderkey" % 7 === 0).count())
    assert(view.cacheValid())
  }

  test("missing instant is an error") {
    base // force build
    intercept[IllegalArgumentException] {
      DeleteView(spark, base, "19990101000000")
    }
  }

  test("delete then re-insert: snapshot serves new payload, delete view keeps old") {
    val dir = freshDir("orders_reinsert")
    val small = orders.limit(200).cache()
    val victims = small.filter($"o_orderkey" % 10 === 1)
    val w = new CowWriter(spark, dir, numBuckets = 4)
    w.insert(small, keyCol, partCol, C1)
    w.delete(victims, keyCol, partCol, C2)
    // C3 re-inserts the deleted keys with a changed payload
    w.upsert(victims.withColumn("o_totalprice", $"o_totalprice" + 5),
      keyCol, partCol, C3)
    val t = graft.sources.GraftTable(spark, dir)
    assert(t.snapshot().count() == small.count(), "re-insert restores count")
    val reborn = t.snapshot()
      .filter($"o_orderkey" % 10 === 1)
      .join(victims.select($"o_orderkey",
        ($"o_totalprice" + 5).as("expected")), Seq("o_orderkey"))
    assert(reborn.filter($"o_totalprice" =!= $"expected").isEmpty,
      "re-inserted rows carry the new payload")
    // the delete view of C2 still reconstructs the ORIGINAL payload
    val view = t.deleteView(C2)
    assert(view.count() == victims.count())
    assert(view.select("o_orderkey", "o_totalprice")
      .exceptAll(victims.select("o_orderkey", "o_totalprice")).isEmpty,
      "delete view shows pre-delete payload, not the re-inserted one")
    // and those rows carry C1 commit provenance restamped to C2
    assert(view.select(MetaCols.CommitTime).distinct()
      .as[String].collect().toSeq == Seq(C2))
  }

  test("snapshot semantics: survivors keep original commit time (COW carry-over)") {
    val tl = Timeline(spark.sessionState.newHadoopConf(), base)
    val slices = tl.latestSlices(Some(C2))
    val paths = slices.values.flatMap(s => s.relPath.map(rp => s"$base/$rp")).toSeq
    val snap = spark.read.parquet(paths: _*)
    // rows surviving C2 still carry C1 as their commit time
    assert(snap.select(MetaCols.CommitTime).distinct().as[String].collect().toSeq == Seq(C1))
    assert(snap.count() == orders.filter($"o_orderkey" % 7 =!= 0).count())
  }
}
