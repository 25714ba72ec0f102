package graft.views

import graft.format.MetaCols
import graft.read.{ChangeFeed, SnapshotReader}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained per-group MIN/MAX view — the extremum analog
  * of [[MaterializedAgg]], solving the part sums cannot express: extrema
  * are NOT invertible under deletes (subtracting a retracted value tells
  * you nothing about the new minimum), so a delete-heavy source would
  * force either per-group value state or a full recompute per refresh.
  *
  * The churn-bounded shape used here: fold the CDC range into per-group
  * insert/retraction extrema, then
  *
  *  - groups whose retractions CANNOT have removed the current extremum
  *    (every retracted value strictly inside the group's (min, max) open
  *    interval — or no retractions at all) merge purely incrementally:
  *    `min = least(old_min, inserted_min)`, symmetric for max, zero
  *    source IO;
  *  - ONLY groups whose current extremum may have been retracted (a
  *    retracted value equal to the recorded min/max — equality is
  *    conservative under duplicates, which is correct, just occasionally
  *    recomputes a group whose twin survived) are re-aggregated from the
  *    source, with the scan filtered to exactly those group values — a
  *    pushed-down IN filter the group column's column-stats / bloom /
  *    bucket indexes serve at file-listing time when tracked.
  *
  * So refresh IO = CDC range + the affected-groups slice of the source:
  * churn-bounded on both sides, never a full source scan (except the
  * structural-commit fallback, exactly like [[MaterializedAgg]]).
  *
  * View payload: `(group, n_rows, min_val, max_val)`; `n_rows` tracks
  * group liveness (a group whose count reaches zero leaves the view).
  * NULL measure values are ignored by the extrema (SQL min/max
  * semantics) but counted by `n_rows`; a group whose every value is NULL
  * carries NULL extrema, matching the full GROUP BY the view must stay
  * bit-identical to. Top-k per group is this same algebra with a
  * k-element sorted list in place of the scalar extremum —
  * [[MaterializedTopK]].
  */
object MaterializedExtrema {

  /** Single measure refresh; view payload (group, n_rows, min_val,
    * max_val). Returns the source commit ts the view now reflects. */
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

  /** Read the maintained view (group, n_rows, min_val, max_val). */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    SnapshotReader.read(spark, viewPath)

  private def aggregate(src: DataFrame, groupCol: String,
      v: Column): DataFrame =
    src.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        min(v.cast("long")).as("min_val"),
        max(v.cast("long")).as("max_val"))

  /** CDC-driven path: per-group fold of the change range, incremental
    * merge where the extremum provably survived, bounded per-group source
    * re-aggregation where it may not have. */
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
        min(when(col("__sign") > 0, col("__v"))).as("__add_min"),
        max(when(col("__sign") > 0, col("__v"))).as("__add_max"),
        min(when(col("__sign") < 0, col("__v"))).as("__rem_min"),
        max(when(col("__sign") < 0, col("__v"))).as("__rem_max"))

    // prune the view read to the touched groups (record-key IN filter →
    // bucket pruning + col-stats skipping) when the churn is small
    val touched = deltas.select(col("__g").cast("string"))
      .limit(maxPushdownGroups + 1).collect().map(_.getString(0))
    val viewRows =
      (if (touched.length <= maxPushdownGroups)
        viewSnap.filter(col(MetaCols.RecordKey)
          .isin(touched.toIndexedSeq: _*))
      else viewSnap)
        .select(col(groupCol).as("__g"), col("n_rows").as("__on"),
          col("min_val").as("__omin"), col("max_val").as("__omax"))

    val merged = deltas.join(viewRows, Seq("__g"), "left_outer")
      .withColumn("__nn", coalesce(col("__on"), lit(0L)) + col("__dn"))
      // the recorded extremum may be gone when a retracted value touches
      // it (equality is the only way: retracted values lie inside
      // [old_min, old_max] unless they were also inserted in-range — and
      // a group ABSENT from the view recomputes whenever anything was
      // retracted, since its inserted extrema may themselves be retracted)
      .withColumn("__recomp", col("__nn") > 0 && col("__rem_n") > 0 &&
        (col("__on").isNull ||
          (col("__rem_min").isNotNull &&
            (col("__omin").isNull || col("__rem_min") <= col("__omin"))) ||
          (col("__rem_max").isNotNull &&
            (col("__omax").isNull || col("__rem_max") >= col("__omax")))))

    val fastUps = merged.filter(col("__nn") > 0 && !col("__recomp"))
      .select(col("__g").as(groupCol), col("__nn").as("n_rows"),
        least(col("__omin"), col("__add_min")).as("min_val"),
        greatest(col("__omax"), col("__add_max")).as("max_val"))

    // churn-bounded re-aggregation of only the affected groups, filter
    // pushed to the source scan (stats/bloom/bucket indexes serve it)
    val recompGroups = merged.filter(col("__recomp")).select(col("__g"))
    val affected = recompGroups.limit(maxPushdownGroups + 1).collect()
      .map(_.get(0))
    val src = SnapshotReader.read(spark, srcPath)
    val freshUps =
      if (affected.isEmpty) null
      else if (affected.length <= maxPushdownGroups)
        aggregate(src.filter(col(groupCol)
          .isin(affected.toIndexedSeq: _*)), groupCol, v)
      else aggregate(src.join(broadcast(
          recompGroups.select(col("__g").as(groupCol))), Seq(groupCol),
          "left_semi"), groupCol, v)

    val ups = Option(freshUps).fold(fastUps)(fastUps.unionByName(_))
    val dels = merged.filter(col("__nn") <= 0)
      .select(col("__g").as(groupCol), lit(0L).as("n_rows"),
        lit(null).cast("long").as("min_val"),
        lit(null).cast("long").as("max_val"))
    (ups, dels)
  }

  /** Structural-commit fallback: one full recompute, diffed null-safely
    * against the view (extrema are nullable — all-NULL-value groups). */
  private def recomputeDiff(spark: SparkSession, srcPath: String,
      viewSnap: DataFrame, groupCol: String, v: Column)
      : (DataFrame, DataFrame) = {
    val fresh = aggregate(SnapshotReader.read(spark, srcPath), groupCol, v)
    val current = viewSnap.select(col(groupCol).as("__g"),
      col("n_rows").as("__on"), col("min_val").as("__omin"),
      col("max_val").as("__omax"))
    val joined = fresh.join(current, fresh(groupCol) === col("__g"),
      "full_outer")
    val changed = !(col("__on") <=> col("n_rows")) ||
      !(col("__omin") <=> col("min_val")) ||
      !(col("__omax") <=> col("max_val"))
    (joined.filter(fresh(groupCol).isNotNull && changed)
       .select(fresh(groupCol), col("n_rows"), col("min_val"),
         col("max_val")),
     joined.filter(fresh(groupCol).isNull)
       .select(col("__g").as(groupCol), lit(0L).as("n_rows"),
         lit(null).cast("long").as("min_val"),
         lit(null).cast("long").as("max_val")))
  }
}
