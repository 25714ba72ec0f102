package graft

import graft.format._
import org.scalatest.funsuite.AnyFunSuite

class FormatSpec extends AnyFunSuite {

  private val meta = CommitMetadata(
    partitionToWriteStats = Map(
      "A" -> Seq(
        WriteStat("A-0", Some("A/A-0_t2.parquet"), Some("t1"), 10, 2, 3, 0),
        WriteStat("A-1", None, Some("t1"), 0, 5, 0, 0)),
      "R" -> Seq(
        WriteStat("R-0", Some("R/R-0_t2.parquet"), None, 7, 0, 0, 7))),
    operationType = "UPSERT",
    totalRecordsDeleted = 7,
    totalRecordsWritten = 17)

  test("commit metadata JSON round-trips exactly") {
    val json = JsonCodec.toJson(meta)
    assert(JsonCodec.fromJson(json) == meta)
  }

  test("statByFileId finds stats across partitions") {
    assert(meta.statByFileId("R-0").map(_._1).contains("R"))
    assert(meta.statByFileId("A-1").flatMap(_._2.prevCommit).contains("t1"))
    assert(meta.statByFileId("nope").isEmpty)
  }

  test("allStats is deterministic (sorted by partition)") {
    assert(meta.allStats.map(_._2.fileId) == Seq("A-0", "A-1", "R-0"))
  }
}
