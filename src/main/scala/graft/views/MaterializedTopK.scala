package graft.views

import graft.format.MetaCols
import graft.read.{ChangeFeed, SnapshotReader}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally maintained per-group TOP-K values view — the k-element
  * generalization of [[MaterializedExtrema]] (max is k = 1): each group
  * row carries the k largest measure values as a DESC-sorted
  * `array<long>`.
  *
  * Same retraction-bounded algebra: inserted values merge incrementally
  * (concat + sort + slice against the recorded list — a value that could
  * displace list members is by definition larger than the list's tail,
  * so the merge is closed over the recorded state); a group re-aggregates
  * from the source ONLY when a retracted value may sit in its recorded
  * list — retracted value ≥ the list's k-th (smallest) element, or the
  * list holds fewer than k values (then every present value is listed).
  * The in-range insert-then-delete hazard resolves the same way as the
  * scalar case: a retracted value large enough to have entered the list
  * necessarily trips the ≥-k-th trigger, so the fast path never keeps a
  * value that was retracted.
  *
  * The re-aggregation ranks with a partitioned `row_number` window (plans
  * as WindowGroupLimit — ≤ k rows leave each map partition per group),
  * never `collect_list` over a whole group, so a hot group cannot
  * materialize group-sized state. Source scan is filtered to the affected
  * group values (stats/bloom/bucket indexes prune at listing time).
  *
  * View payload: `(group, n_rows, topk_vals)`. NULL measure values count
  * in `n_rows` but never enter the list (SQL ordering semantics); a
  * group with only NULL values carries an empty list. [[readExploded]]
  * serves the view as `(group, rnk, val)` rows — the shape a SQL
  * `row_number ≤ k` oracle reproduces exactly.
  */
object MaterializedTopK {

  /** Refresh the maintained top-k view; returns the reflected source ts. */
  def refresh(spark: SparkSession, srcPath: String, viewPath: String,
      groupCol: String, valueExpr: Column, k: Int, buckets: Int = 8,
      maxPushdownGroups: Int = 10000): String = {
    require(k > 0, "k must be positive")
    ViewRefresh.run(spark, srcPath, viewPath, groupCol, buckets,
      bootstrap = src => aggregate(src, groupCol, valueExpr, k),
      diff = (viewSnap, structural, from, to) =>
        if (structural) recomputeDiff(spark, srcPath, viewSnap, groupCol,
          valueExpr, k)
        else incrementalDiff(spark, srcPath, viewSnap, groupCol, valueExpr,
          k, from, to, maxPushdownGroups))
  }

  /** Read the maintained view (group, n_rows, topk_vals). */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    SnapshotReader.read(spark, viewPath)

  /** The view as one row per listed value: (group, rnk 1..k DESC by
    * value, val) — deterministic as a row set even under value ties. */
  def readExploded(spark: SparkSession, viewPath: String): DataFrame =
    read(spark, viewPath)
      .select(col("*"), posexplode(col("topk_vals")).as(Seq("__p", "val")))
      .select(col("*"), (col("__p") + 1).as("rnk"))
      .drop("__p", "topk_vals")

  /** Per-group top-k aggregate of `src`: rank with a partitioned window
    * (WindowGroupLimit-friendly), then fold the ≤ k survivors per group
    * into the sorted list. */
  private def aggregate(src: DataFrame, groupCol: String, v: Column,
      k: Int): DataFrame = {
    val base = src.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), v.cast("long").as("__v"))
    val counts = base.groupBy(col("__g")).agg(count(lit(1)).as("n_rows"))
    val lists = base.filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__v").desc)))
      .filter(col("__rn") <= k)
      .groupBy(col("__g"))
      .agg(sort_array(collect_list(col("__v")), asc = false)
        .as("topk_vals"))
    counts.join(lists, Seq("__g"), "left_outer")
      .select(col("__g").as(groupCol), col("n_rows"),
        coalesce(col("topk_vals"), array().cast("array<long>"))
          .as("topk_vals"))
  }

  private def incrementalDiff(spark: SparkSession, srcPath: String,
      viewSnap: DataFrame, groupCol: String, v: Column, k: Int,
      fromExclusive: String, toInclusive: String,
      maxPushdownGroups: Int): (DataFrame, DataFrame) = {
    val ch = ChangeFeed.read(spark, srcPath, fromExclusive, toInclusive,
      preImages = true)
    val isAdd = col(ChangeFeed.ChangeType).isin("insert", "update")
    // per-group fold: net count, retraction count/max, and the top-k of
    // the INSERTED values (k per group suffices — anything below a
    // group's inserted k-th can never enter a k-list)
    val base = ch.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        when(isAdd, 1L).otherwise(-1L).as("__sign"),
        v.cast("long").as("__v"))
    val addTop = base.filter(col("__sign") > 0 && col("__v").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__v").desc)))
      .filter(col("__rn") <= k)
      .groupBy(col("__g"))
      .agg(sort_array(collect_list(col("__v")), asc = false).as("__adds"))
    val deltas = base.groupBy(col("__g"))
      .agg(sum(col("__sign")).as("__dn"),
        count(when(col("__sign") < 0, lit(1))).as("__rem_n"),
        max(when(col("__sign") < 0, col("__v"))).as("__rem_max"))
      .join(addTop, Seq("__g"), "left_outer")

    val touched = deltas.select(col("__g").cast("string"))
      .limit(maxPushdownGroups + 1).collect().map(_.getString(0))
    val viewRows =
      (if (touched.length <= maxPushdownGroups)
        viewSnap.filter(col(MetaCols.RecordKey)
          .isin(touched.toIndexedSeq: _*))
      else viewSnap)
        .select(col(groupCol).as("__g"), col("n_rows").as("__on"),
          col("topk_vals").as("__olist"))

    val merged = deltas.join(viewRows, Seq("__g"), "left_outer")
      .withColumn("__nn", coalesce(col("__on"), lit(0L)) + col("__dn"))
      // recompute iff a retraction may touch the recorded list: the list
      // is short of k (every present value is listed) or the retracted
      // max reaches the list's smallest member; absent groups recompute
      // on any retraction (their inserted list may itself be retracted)
      .withColumn("__recomp", col("__nn") > 0 && col("__rem_n") > 0 &&
        (col("__on").isNull || size(col("__olist")) < k ||
          (col("__rem_max").isNotNull && col("__rem_max") >=
            when(size(col("__olist")) > 0,
              element_at(col("__olist"), -1)))))

    val mergedList = slice(
      sort_array(concat(coalesce(col("__olist"),
        array().cast("array<long>")),
        coalesce(col("__adds"), array().cast("array<long>"))),
        asc = false), 1, k)
    val fastUps = merged.filter(col("__nn") > 0 && !col("__recomp"))
      .select(col("__g").as(groupCol), col("__nn").as("n_rows"),
        mergedList.as("topk_vals"))

    val recompGroups = merged.filter(col("__recomp")).select(col("__g"))
    val affected = recompGroups.limit(maxPushdownGroups + 1).collect()
      .map(_.get(0))
    val src = SnapshotReader.read(spark, srcPath)
    val freshUps =
      if (affected.isEmpty) null
      else if (affected.length <= maxPushdownGroups)
        aggregate(src.filter(col(groupCol)
          .isin(affected.toIndexedSeq: _*)), groupCol, v, k)
      else aggregate(src.join(broadcast(
          recompGroups.select(col("__g").as(groupCol))), Seq(groupCol),
          "left_semi"), groupCol, v, k)

    val ups = Option(freshUps).fold(fastUps)(fastUps.unionByName(_))
    val dels = merged.filter(col("__nn") <= 0)
      .select(col("__g").as(groupCol), lit(0L).as("n_rows"),
        array().cast("array<long>").as("topk_vals"))
    (ups, dels)
  }

  private def recomputeDiff(spark: SparkSession, srcPath: String,
      viewSnap: DataFrame, groupCol: String, v: Column, k: Int)
      : (DataFrame, DataFrame) = {
    val fresh = aggregate(SnapshotReader.read(spark, srcPath), groupCol,
      v, k)
    val current = viewSnap.select(col(groupCol).as("__g"),
      col("n_rows").as("__on"), col("topk_vals").as("__olist"))
    val joined = fresh.join(current, fresh(groupCol) === col("__g"),
      "full_outer")
    val changed = !(col("__on") <=> col("n_rows")) ||
      !(col("__olist") <=> col("topk_vals"))
    (joined.filter(fresh(groupCol).isNotNull && changed)
       .select(fresh(groupCol), col("n_rows"), col("topk_vals")),
     joined.filter(fresh(groupCol).isNull)
       .select(col("__g").as(groupCol), lit(0L).as("n_rows"),
         array().cast("array<long>").as("topk_vals")))
  }
}
