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
}
