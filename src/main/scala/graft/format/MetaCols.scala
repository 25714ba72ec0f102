package graft.format

/** Engine-reserved meta columns carried by every data file of a versioned
  * table, mirroring the public Hudi meta-field names the reference relies on
  * (ref: HudiDeleteHandle.java:51,71-74 uses `_hoodie_record_key` and
  * `_hoodie_commit_time`; the other three are standard Hudi meta columns).
  */
object MetaCols {
  val CommitTime    = "_hoodie_commit_time"
  val CommitSeqno   = "_hoodie_commit_seqno"
  val RecordKey     = "_hoodie_record_key"
  val PartitionPath = "_hoodie_partition_path"
  val FileName      = "_hoodie_file_name"

  /** In canonical order (prefix of every data-file schema). */
  val all: Seq[String] =
    Seq(CommitTime, CommitSeqno, RecordKey, PartitionPath, FileName)

  /** Standard Hudi delete-marker column carried by MOR delta files (an
    * implementation detail of delta records — base-commit schemas never
    * record it; see [[graft.read.SnapshotReader.IsDeleted]]). */
  val IsDeleted = "_hoodie_is_deleted"

  /** The STABLE form every commit records: meta columns first (canonical
    * order), payload columns after (input order), all top-level fields
    * nullable. Writers' internal plans reorder columns (a using-column
    * join moves its key first) and flip nullability (a `lit(ts)` stamp is
    * non-null at creation, nullable after a parquet round trip) — recording
    * the raw plan schema would make the table's schema DRIFT across
    * commits, which breaks any consumer that pins it once (the SQL catalog
    * validates its stored schema against the relation on every
    * re-resolution). */
  def canonicalSchema(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      all.flatMap(n => schema.fields.find(_.name == n)
        .map(_.copy(nullable = true))) ++
      schema.fields.filterNot(f => all.contains(f.name))
        .map(_.copy(nullable = true)))
}
