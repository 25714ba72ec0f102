package graft.views

import graft.format.MetaCols
import graft.functions.Bitmap64
import graft.read.{ChangeFeed, SnapshotReader}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained per-group EXACT distinct-count view, built on
  * the mergeable bitmaps of [[graft.functions.Bitmap64]] — the view kind
  * `COUNT(DISTINCT)` cannot have: a distinct count alone is not
  * maintainable (yesterday's number tells you nothing when today's insert
  * may or may not be new), but the bitmap that PRODUCES the number is.
  *
  * View payload: `(group, n_rows, n_distinct, bm)` where `bm` is the
  * group's canonical bitmap over the measure values and `n_distinct` its
  * cardinality; `n_rows` tracks group liveness. Canonical serialization
  * makes the stored binary deterministic, so the structural-recompute diff
  * can compare stored vs fresh bitmaps byte-for-byte.
  *
  * Refresh algebra (the [[ViewRefresh]] skeleton, like
  * [[MaterializedExtrema]]):
  *
  *  - groups whose CDC range contains ONLY inserts merge incrementally:
  *    `bm' = bitmap_union(bm, bitmap_build(inserted))` — zero source IO;
  *    a set union is idempotent, so re-inserting an already-present value
  *    is naturally a no-op;
  *  - groups with ANY retraction re-aggregate from the source, scan
  *    filtered to exactly those group values (pushed-down IN / semi-join,
  *    served by the group column's stats/bloom/bucket indexes). Distinct
  *    sets are strictly non-invertible per value: a retracted value leaves
  *    the set only when its LAST duplicate goes, which only the source
  *    knows. (Storing per-value multiplicities would make deletes local
  *    but blows the payload from one bit to one counter per value — the
  *    wrong trade for an insert-mostly 100 TB feed.)
  *
  * So refresh IO = CDC range + the retraction-touched-groups slice of the
  * source; an insert-only feed never rescans anything.
  */
object MaterializedDistinct {

  /** Run one refresh; returns the source commit ts the view reflects.
    * `valueExpr` must cast to BIGINT (the bitmap key space). */
  def refresh(spark: SparkSession, srcPath: String, viewPath: String,
      groupCol: String, valueExpr: Column, buckets: Int = 8,
      maxPushdownGroups: Int = 10000): String =
    ViewRefresh.run(spark, srcPath, viewPath, groupCol, buckets,
      bootstrap = src => aggregate(src, groupCol, valueExpr),
      diff = (viewSnap, structural, from, to) =>
        if (structural) recomputeDiff(spark, srcPath, viewSnap, groupCol,
          valueExpr)
        else incrementalDiff(spark, srcPath, viewSnap, groupCol, valueExpr,
          from, to, maxPushdownGroups))

  /** Read the maintained view `(group, n_rows, n_distinct, bm)`. */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    SnapshotReader.read(spark, viewPath)

  private def aggregate(src: DataFrame, groupCol: String,
      v: Column): DataFrame =
    src.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        Bitmap64.bitmapBuild(v.cast("long")).as("bm"))
      .withColumn("n_distinct", Bitmap64.bitmapCardinality(col("bm")))
      .select(col(groupCol), col("n_rows"), col("n_distinct"), col("bm"))

  private def incrementalDiff(spark: SparkSession, srcPath: String,
      viewSnap: DataFrame, groupCol: String, v: Column,
      fromExclusive: String, toInclusive: String,
      maxPushdownGroups: Int): (DataFrame, DataFrame) = {
    val ch = ChangeFeed.read(spark, srcPath, fromExclusive, toInclusive,
      preImages = true)
    val isAdd = col(ChangeFeed.ChangeType).isin("insert", "update")
    val deltas = ch.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        when(isAdd, 1L).otherwise(-1L).as("__sign"),
        v.cast("long").as("__v"))
      .groupBy("__g")
      .agg(sum(col("__sign")).as("__dn"),
        count(when(col("__sign") < 0, lit(1))).as("__rem_n"),
        // bitmap_build ignores NULLs, so the when() keeps only inserts
        Bitmap64.bitmapBuild(when(col("__sign") > 0, col("__v")))
          .as("__add_bm"))
      // ONE CDC read (r14): the touched-group collect below and the
      // merged join would each re-run the change-feed scan + fold; the
      // materialized frame is touched-groups-sized
      .localCheckpoint(true)

    // prune the view read to the touched groups when the churn is small
    val touched = deltas.select(col("__g").cast("string"))
      .limit(maxPushdownGroups + 1).collect().map(_.getString(0))
    val viewRows =
      (if (touched.length <= maxPushdownGroups)
        viewSnap.filter(col(MetaCols.RecordKey)
          .isin(touched.toIndexedSeq: _*))
      else viewSnap)
        .select(col(groupCol).as("__g"), col("n_rows").as("__on"),
          col("bm").as("__obm"))

    val merged = deltas.join(viewRows, Seq("__g"), "left_outer")
      .withColumn("__nn", coalesce(col("__on"), lit(0L)) + col("__dn"))
      // any retraction can shrink the distinct set; only the source knows
      // whether the retracted value's last duplicate went
      .withColumn("__recomp", col("__nn") > 0 && col("__rem_n") > 0)
      // ONE view-side join (r14): consumed by fastUps, the recompute
      // collect, and the deletes side — three executions of the pruned
      // view read without the checkpoint
      .localCheckpoint(true)

    val fastUps = merged.filter(col("__nn") > 0 && !col("__recomp"))
      .withColumn("__nbm",
        when(col("__obm").isNull, col("__add_bm"))
          .otherwise(Bitmap64.bitmapUnion(col("__obm"), col("__add_bm"))))
      .select(col("__g").as(groupCol), col("__nn").as("n_rows"),
        Bitmap64.bitmapCardinality(col("__nbm")).as("n_distinct"),
        col("__nbm").as("bm"))

    val recompGroups = merged.filter(col("__recomp")).select(col("__g"))
    val affected = recompGroups.limit(maxPushdownGroups + 1).collect()
      .map(_.get(0))
    val src = SnapshotReader.read(spark, srcPath)
    val freshUps0 =
      if (affected.isEmpty) null
      else if (affected.length <= maxPushdownGroups)
        aggregate(src.filter(col(groupCol)
          .isin(affected.toIndexedSeq: _*)), groupCol, v)
      else aggregate(src.join(broadcast(
          recompGroups.select(col("__g").as(groupCol))), Seq(groupCol),
          "left_semi"), groupCol, v)

    // Drop recomputed rows identical to the stored ones (canonical bitmap
    // bytes make this an exact comparison): a value-preserving update —
    // dn 0, every retraction re-inserted — would otherwise mint a view
    // commit full of unchanged rows on every refresh.
    val freshUps = Option(freshUps0).map(_.join(
        viewRows.select(col("__g").as(groupCol), col("__on"), col("__obm")),
        Seq(groupCol), "left_outer")
      .filter(!(col("n_rows") <=> col("__on")) ||
        !(col("bm") <=> col("__obm")))
      .select(col(groupCol), col("n_rows"), col("n_distinct"), col("bm")))
      .orNull

    val ups = Option(freshUps).fold(fastUps)(fastUps.unionByName(_))
    val dels = merged.filter(col("__nn") <= 0)
      .select(col("__g").as(groupCol), lit(0L).as("n_rows"),
        lit(0L).as("n_distinct"), lit(null).cast("binary").as("bm"))
    (ups, dels)
  }

  /** Structural-commit fallback: full recompute diffed against the view —
    * canonical bitmap bytes make the comparison exact. */
  private def recomputeDiff(spark: SparkSession, srcPath: String,
      viewSnap: DataFrame, groupCol: String, v: Column)
      : (DataFrame, DataFrame) = {
    val fresh = aggregate(SnapshotReader.read(spark, srcPath), groupCol, v)
    val current = viewSnap.select(col(groupCol).as("__g"),
      col("n_rows").as("__on"), col("bm").as("__obm"))
    val joined = fresh.join(current, fresh(groupCol) === col("__g"),
      "full_outer")
    val changed = !(col("__on") <=> col("n_rows")) ||
      !(col("__obm") <=> col("bm"))
    (joined.filter(fresh(groupCol).isNotNull && changed)
       .select(fresh(groupCol), col("n_rows"), col("n_distinct"),
         col("bm")),
     joined.filter(fresh(groupCol).isNull)
       .select(col("__g").as(groupCol), lit(0L).as("n_rows"),
         lit(0L).as("n_distinct"), lit(null).cast("binary").as("bm")))
  }
}
