package graft.read

import graft.format.{MetaCols, Timeline}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Batch `spark.read.format("graft")` relation for snapshots that NEED the
  * MOR window merge (file groups with outstanding deltas) — the case a plain
  * file relation cannot express, previously rejected by the format surface.
  *
  * Shape: a V1 `PrunedFilteredScan`. The V1 scan contract is exactly the
  * lazy-planning point the merge needs — `buildScan` receives the user's
  * pushed filters BEFORE any file is planned, so:
  *
  *  1. **Metadata-level partition pruning on BOTH merge sides.** Predicates
  *     on `_hoodie_partition_path` provably required by the filter tree
  *     ([[GraftMorRelation.partitionValues]]) prune the file-GROUP set
  *     before the window merge is planned. This is lossless — a partition
  *     is a superset of its file groups, and the per-key merge window never
  *     crosses partitions (a record key's group lives in one partition) —
  *     and it closes the base/delta pruning asymmetry: the r5 FileIndex
  *     pruned only the base-file side, deltas were row-filtered post-merge.
  *     At 100 TB this is the difference between merging one partition's
  *     un-compacted groups and merging all of them.
  *  2. **The merge itself stays declarative.** The scan body IS
  *     [[SnapshotReader.merge]]'s plan (pruning FileIndex on base-only
  *     groups, window merge on dirty ones) with the pushed filters applied
  *     on top — Catalyst then pushes them below the union into the parquet
  *     scans wherever legal (everywhere except across the merge window).
  *     `needConversion = false` hands the optimized plan's InternalRows
  *     straight through (the JDBC-relation pattern), no Row round-trip.
  *
  * The reference serves its view as a plain `Dataset<Row>` with no
  * compaction precondition (ref: DeleteSupport.java:89-96); this relation
  * gives the format surface the same totality.
  */
final class GraftMorRelation(
    spark: SparkSession,
    basePath: String,
    asOf: Option[String],
    override val schema: StructType) extends BaseRelation
    with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext

  /** buildScan returns the optimized inner plan's InternalRows directly. */
  override def needConversion: Boolean = false

  /** Absolute data-file paths the last `buildScan` planned (base + delta) —
    * observability/test hook for the metadata-pruning contract; the V1 RDD
    * hides them from `DataFrame.inputFiles`. */
  @volatile private[graft] var lastPlannedFiles: Seq[String] = Seq.empty

  /** Filters this relation fully applies itself (everything expressible as
    * a Column); the engine re-evaluates only what's returned here. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(f => GraftMorRelation.toColumn(f).isDefined)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val timeline = Timeline(spark.sessionState.newHadoopConf(), basePath)
    val all = timeline.latestSlices(asOf).values.toSeq
    val slices = GraftMorRelation.partitionValues(filters) match {
      case Some(parts) => all.filter(s => parts.contains(s.partitionPath))
      case None => all
    }
    lastPlannedFiles = slices.flatMap(s =>
      (s.relPath.toSeq ++ s.deltas.map(_.relPath))
        .map(rp => s"$basePath/$rp"))
    val snap: DataFrame =
      if (slices.isEmpty) // filters selected no partition: empty, not error
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else SnapshotReader.merge(spark, basePath, slices, Some(timeline), asOf)
    val filtered = filters.flatMap(GraftMorRelation.toColumn)
      .foldLeft(snap)((df, c) => df.filter(c))
    val projected = filtered.select(
      requiredColumns.map(col).toIndexedSeq: _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

/** Incremental read behind the format surface:
  * `spark.read.format("graft").option("from", c1).option("to", c2)` — the
  * current state of every record written in `(from, to]`, planned by
  * [[IncrementalReader]] (only the file groups the range's commits wrote
  * enter the plan). Same V1 PrunedFilteredScan shape as
  * [[GraftMorRelation]]: pushed partition predicates become
  * IncrementalReader's metadata-level `partitions` pruning, remaining
  * filters apply on top of the declarative plan. */
final class GraftIncrementalRelation(
    spark: SparkSession,
    basePath: String,
    fromExclusive: String,
    toInclusive: String,
    override val schema: StructType) extends BaseRelation
    with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext
  override def needConversion: Boolean = false

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(f => GraftMorRelation.toColumn(f).isDefined)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val parts = GraftMorRelation.partitionValues(filters)
      .map(_.toSeq.sorted).getOrElse(Seq.empty)
    val inc = IncrementalReader.read(spark, basePath, fromExclusive,
      toInclusive, partitions = parts)
    val filtered = filters.flatMap(GraftMorRelation.toColumn)
      .foldLeft(inc)((df, c) => df.filter(c))
    filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

/** The DELETE VIEW — the reference's core capability
  * (`DeleteSupport(path, ts).getDeleteDataset()`) — behind the format
  * surface: `spark.read.format("graft").option("deleteView", ts)`. The
  * rows deleted by commit `ts`, materialized-once/served-cached with the
  * same idempotence contract as `GraftTable.deleteView`. Schema comes
  * from the lazy plan (no materialization at relation-create time); the
  * first scan materializes, later scans read the cached view. Filters are
  * applied on top and pushed by Catalyst into whichever plan serves the
  * scan (anti-join or cached parquet). */
final class GraftDeleteViewRelation(
    spark: SparkSession,
    basePath: String,
    ts: String) extends BaseRelation with PrunedFilteredScan {

  private val view = graft.deleteview.DeleteView(spark, basePath, ts)

  override val schema: StructType = view.plan().schema

  override def sqlContext: SQLContext = spark.sqlContext
  override def needConversion: Boolean = false

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(f => GraftMorRelation.toColumn(f).isDefined)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(GraftMorRelation.toColumn)
      .foldLeft(view.toDF())((df, c) => df.filter(c))
    filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

object GraftMorRelation {

  /** Translate a pushed source filter back to a Column predicate; None for
    * shapes the relation leaves to the engine (declared unhandled). */
  private[graft] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  /** Partition paths provably REQUIRED by the pushed filter set, for
    * metadata-level file-group pruning — sound only when an `=`/`IN` on
    * `_hoodie_partition_path` is a top-level conjunct (the pushed filters
    * are implicitly AND-ed; inside an AND both sides constrain). Any other
    * shape (OR with other columns, ranges, NOT) returns None: no metadata
    * pruning, the row-level filter still applies, correctness unaffected.
    * `IsNotNull(part)` is NOT a value constraint — ignored. */
  private[graft] def partitionValues(
      filters: Array[Filter]): Option[Set[String]] = {
    def fromConjunct(f: Filter): Option[Set[String]] = f match {
      case EqualTo(a, v: String) if a == MetaCols.PartitionPath =>
        Some(Set(v))
      case EqualNullSafe(a, v: String) if a == MetaCols.PartitionPath =>
        Some(Set(v))
      case In(a, vs) if a == MetaCols.PartitionPath =>
        Some(vs.collect { case s: String => s }.toSet)
      case And(l, r) => (fromConjunct(l), fromConjunct(r)) match {
        case (Some(x), Some(y)) => Some(x intersect y)
        case (x, y) => x.orElse(y)
      }
      case _ => None
    }
    val sets = filters.flatMap(fromConjunct)
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }
}
