package graft

import graft.format._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileStatus, FileSystem, FilterFileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** FS wrapper that counts listings and can inject transient IO failures. */
private final class CountingFs(underlying: FileSystem)
    extends FilterFileSystem(underlying) {
  var lists = 0
  var failNext = 0
  private def maybeFail(): Unit =
    if (failNext > 0) { failNext -= 1
      throw new java.io.IOException("injected transient failure") }
  override def listStatus(f: Path): Array[FileStatus] = {
    maybeFail(); lists += 1; super.listStatus(f)
  }
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    maybeFail(); super.open(f, bufferSize)
  }
}

class FormatSpec extends AnyFunSuite {

  private def freshTable(nCommits: Int): (CountingFs, Timeline) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val fs = new CountingFs(FileSystem.getLocal(new Configuration()))
    val t = new Timeline(fs, new Path(dir))
    (1 to nCommits).foreach { i =>
      t.saveCommit(s"100$i", CommitMetadata(
        partitionToWriteStats = Map("P" -> Seq(
          WriteStat(s"P-0", Some(s"P/P-0_100$i.parquet"), None, 1, 0, 0, 1))),
        operationType = "INSERT", totalRecordsDeleted = 0,
        totalRecordsWritten = 1))
    }
    (fs, t)
  }

  private val meta = CommitMetadata(
    partitionToWriteStats = Map(
      "A" -> Seq(
        WriteStat("A-0", Some("A/A-0_1002.parquet"), Some("1001"), 10, 2, 3, 0),
        WriteStat("A-1", None, Some("1001"), 0, 5, 0, 0)),
      "R" -> Seq(
        WriteStat("R-0", Some("R/R-0_1002.parquet"), None, 7, 0, 0, 7))),
    operationType = "UPSERT",
    totalRecordsDeleted = 7,
    totalRecordsWritten = 17,
    extra = Map("streaming.batchId" -> "7", "buckets" -> "4"))

  test("commit metadata JSON round-trips exactly (incl. extraMetadata)") {
    val json = JsonCodec.toJson(meta)
    assert(JsonCodec.fromJson(json) == meta)
    // pre-extra commit files (no extraMetadata field) decode to empty map
    val legacy = JsonCodec.toJson(meta.copy(extra = Map.empty))
    assert(!legacy.contains("extraMetadata"))
    assert(JsonCodec.fromJson(legacy).extra.isEmpty)
  }

  test("saveCommit validates ts: digits only, fixed width per table") {
    val (_, t) = freshTable(nCommits = 1)
    def commit(ts: String): Unit = t.saveCommit(ts, CommitMetadata(
      partitionToWriteStats = Map.empty, operationType = "INSERT",
      totalRecordsDeleted = 0, totalRecordsWritten = 0))
    intercept[IllegalArgumentException](commit("t2"))      // non-numeric
    intercept[IllegalArgumentException](commit("20260101000000")) // width≠4
    intercept[IllegalArgumentException](commit(""))        // empty
    commit("1002") // matching width: fine
    assert(t.completedInstants().map(_.ts) == Seq("1001", "1002"))
  }

  test("FormatWriter.nextTs: strictly after the newest commit, width preserved") {
    import graft.write.FormatWriter.nextTs
    // width-mismatched table (4-digit ts): numeric bump at fixed width
    val (_, t4) = freshTable(nCommits = 2)
    assert(nextTs(t4) == "1003")
    // 14-digit (wall-clock-shaped) table: clock when it sorts after, else bump
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    val t14 = new Timeline(
      org.apache.hadoop.fs.FileSystem.getLocal(
        new org.apache.hadoop.conf.Configuration()),
      new org.apache.hadoop.fs.Path(dir))
    t14.saveCommit("20260101000000", CommitMetadata(
      partitionToWriteStats = Map.empty, operationType = "INSERT",
      totalRecordsDeleted = 0, totalRecordsWritten = 0))
    val next = nextTs(t14)
    assert(next.length == 14 && next.forall(_.isDigit) &&
      next > "20260101000000")
    // far-future newest commit: the clock is behind, bump keeps monotonic
    t14.saveCommit("99990101000000", CommitMetadata(
      partitionToWriteStats = Map.empty, operationType = "INSERT",
      totalRecordsDeleted = 0, totalRecordsWritten = 0))
    assert(nextTs(t14) == "99990101000001")
    // empty table: a 14-digit wall-clock ts
    val t0 = new Timeline(t14.fs, new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("graft-ts0").toString))
    assert(nextTs(t0).length == 14 && nextTs(t0).forall(_.isDigit))
  }

  test("saveCommit rejects re-landing a completed instant (either action)") {
    val (_, t) = freshTable(nCommits = 1)
    val empty = CommitMetadata(
      partitionToWriteStats = Map.empty, operationType = "INSERT",
      totalRecordsDeleted = 0, totalRecordsWritten = 0)
    // same ts + same action: completed commits are immutable
    val e1 = intercept[IllegalArgumentException](t.saveCommit("1001", empty))
    assert(e1.getMessage.contains("already completed"))
    // same ts + OTHER action: a ts names at most one instant
    val e2 = intercept[IllegalArgumentException](
      t.saveCommit("1001", empty, Instant.DeltaCommitAction))
    assert(e2.getMessage.contains("already completed"))
    // an unused ts still lands
    t.saveCommit("1002", empty)
    assert(t.completedInstants().map(_.ts) == Seq("1001", "1002"))
  }

  test("statByFileId finds stats across partitions") {
    assert(meta.statByFileId("R-0").map(_._1).contains("R"))
    assert(meta.statByFileId("A-1").flatMap(_._2.prevCommit).contains("1001"))
    assert(meta.statByFileId("nope").isEmpty)
  }

  test("allStats is deterministic (sorted by partition)") {
    assert(meta.allStats.map(_._2.fileId) == Seq("A-0", "A-1", "R-0"))
  }

  test("latestSlices does ONE FS listing regardless of commit count") {
    val (fs, t) = freshTable(nCommits = 5)
    fs.lists = 0
    val slices = t.latestSlices(None)
    assert(slices("P-0").commitTs == "1005")
    assert(fs.lists == 1, s"expected 1 listing, saw ${fs.lists}")
    t.latestSlices(None) // memo serves the second walk entirely
    assert(fs.lists == 1)
    t.refresh()
    t.completedInstants()
    assert(fs.lists == 2)
  }

  test("saveCommit invalidates the instant-listing memo") {
    val (_, t) = freshTable(nCommits = 1)
    assert(t.completedInstants().map(_.ts) == Seq("1001"))
    t.saveCommit("1002", CommitMetadata(
      partitionToWriteStats = Map("P" -> Seq(
        WriteStat("P-0", Some("P/P-0_1002.parquet"), Some("1001"), 1, 0, 1, 0))),
      operationType = "UPSERT", totalRecordsDeleted = 0,
      totalRecordsWritten = 1))
    assert(t.completedInstants().map(_.ts) == Seq("1001", "1002"))
  }

  test("metadata FS reads survive one injected transient failure") {
    val (fs, t) = freshTable(nCommits = 2)
    t.refresh()
    fs.failNext = 1 // first listStatus throws; retryOnce recovers
    assert(t.completedInstants().size == 2)
    fs.failNext = 1 // first open throws; retryOnce recovers
    assert(t.metadata("1002").operationType == "INSERT")
    // two consecutive failures exceed the single bounded retry
    val t2 = new Timeline(fs, t.basePath)
    t2.completedInstants()
    fs.failNext = 2
    intercept[java.io.IOException](t2.metadata("1001"))
  }
}
