package graft.read

import graft.format.MetaCols
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-automatic partition pruning for snapshot scans.
  *
  * The snapshot planner already knows each slice's partition path from
  * commit metadata; this `FileIndex` hands that knowledge to Catalyst by
  * declaring `_hoodie_partition_path` as a PARTITION column of the
  * relation. `PruneFileSourcePartitions` then routes any predicate on it
  * into [[listFiles]]' `partitionFilters`, so the normal user idiom
  * `snapshot.filter($"_hoodie_partition_path" === "p0")` plans ONLY the
  * matching partitions' slices — listing-time pruning, before a single
  * footer or row group is touched. (The reference delegates exactly this to
  * Hudi's file-system view, ref: DeleteSupport.java:42-46.) At 100 TB this
  * is the difference between planning one partition and planning every
  * file group on each filtered query.
  *
  * The data files carry `_hoodie_partition_path` as a regular column too;
  * the relation's data schema EXCLUDES it, so each row's value comes from
  * the (identical) directory-level partition value and the stored column
  * is simply never requested — the standard lakehouse-format layout.
  *
  * No directory listing ever happens here: the slice list IS the file
  * list (one `getFileStatus` per planned file, driver metadata-scale, no
  * footer reads — the table schema comes from commit metadata).
  */
final class GraftFileIndex(
    override val rootPaths: Seq[Path],
    partFiles: Seq[(String, Seq[FileStatus])])
  extends FileIndex {

  override val partitionSchema: StructType = GraftFileIndex.PartitionSchema

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected = if (partitionFilters.isEmpty) partFiles
    else {
      // Standard partition-pruning evaluation (the PartitioningAwareFileIndex
      // pattern): bind the predicate to the 1-column partition row and keep
      // matching partitions. Attribute lookup honors spark.sql.caseSensitive
      // and fails with a clear message if a filter was routed here with an
      // attribute outside the partition schema (instead of an opaque
      // index-out-of-bounds from position -1).
      val caseSensitive = org.apache.spark.sql.internal.SQLConf.get
        .caseSensitiveAnalysis
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.indexWhere(f =>
              if (caseSensitive) f.name == a.name
              else f.name.equalsIgnoreCase(a.name))
            require(i >= 0,
              s"partition filter attribute '${a.name}' is not a partition " +
                s"column (${partitionSchema.fieldNames.mkString(", ")})")
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        })
      partFiles.filter { case (part, _) =>
        bound.eval(InternalRow(UTF8String.fromString(part)))
      }
    }
    selected.map { case (part, files) =>
      PartitionDirectory(InternalRow(UTF8String.fromString(part)),
        files.toArray)
    }
  }

  override def inputFiles: Array[String] =
    partFiles.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = partFiles.flatMap(_._2).map(_.getLen).sum
}

/** Parquet format whose WRITE path is disabled: Spark's analyzer happily
  * plans `INSERT INTO` against any `HadoopFsRelation`, and a raw file
  * insert into a versioned table would land parquet files the timeline
  * never records — accepted, then silently invisible to every reader
  * (observed before this guard). Reads (vectorized scan, filter pushdown,
  * partition pruning) are inherited unchanged; only `prepareWrite` — the
  * first step of any insert plan — refuses, pointing at the real write
  * surface. */
private[read] final class GraftReadOnlyParquetFormat
    extends ParquetFileFormat {
  override def prepareWrite(sparkSession: org.apache.spark.sql.SparkSession,
      job: org.apache.hadoop.mapreduce.Job,
      options: Map[String, String],
      dataSchema: StructType)
      : org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      "graft tables do not support INSERT INTO (raw file writes bypass " +
        "the commit timeline and would be invisible to readers); write " +
        """through df.write.format("graft") (upsert/delete by key) or """ +
        "the CowWriter/MorWriter APIs instead")
}

object GraftFileIndex {

  /** The one partition column every slice layout shares. */
  val PartitionSchema: StructType = StructType(Seq(
    StructField(MetaCols.PartitionPath, StringType, nullable = true)))

  /** Mount a pruning parquet relation over concrete slice files.
    *
    * @param fullSchema the table schema (commit-metadata-resolved — MUST
    *                   contain `_hoodie_partition_path`); the relation's
    *                   data schema is `fullSchema` minus the partition
    *                   column, and the result is re-projected to
    *                   `fullSchema`'s column order so the scan is a drop-in
    *                   for a plain multi-path parquet read.
    * @param partFiles  (partitionPath, absolute file paths) per partition.
    */
  def scan(spark: SparkSession, basePath: String,
      partFiles: Seq[(String, Seq[String])],
      fullSchema: StructType): DataFrame = {
    val df = Bridge.ofRows(spark,
      LogicalRelation(relation(spark, basePath, partFiles, fullSchema)))
    // restore the canonical column order (partition cols mount at the end)
    df.select(fullSchema.fieldNames.map(org.apache.spark.sql.functions.col)
      .toIndexedSeq: _*)
  }

  /** The underlying pruning `HadoopFsRelation` (also served as the batch
    * `spark.read.format("graft")` relation — see
    * [[graft.streaming.GraftSourceProvider]]). */
  def relation(spark: SparkSession, basePath: String,
      partFiles: Seq[(String, Seq[String])],
      fullSchema: StructType): HadoopFsRelation = {
    require(fullSchema.fieldNames.contains(MetaCols.PartitionPath),
      s"table schema must carry ${MetaCols.PartitionPath}")
    val fs = new Path(basePath).getFileSystem(
      spark.sessionState.newHadoopConf())
    val statuses = partFiles.map { case (part, paths) =>
      part -> paths.map(p => fs.getFileStatus(new Path(p)))
    }
    val dataSchema = StructType(
      fullSchema.filterNot(_.name == MetaCols.PartitionPath))
    HadoopFsRelation(
      location = new GraftFileIndex(Seq(new Path(basePath)), statuses),
      partitionSchema = PartitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new GraftReadOnlyParquetFormat,
      options = Map.empty)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
  }
}
