package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Native timeline reader/writer over `<basePath>/.hoodie/`.
  *
  * Replaces the reference's external timeline server
  * (RemoteHoodieTableFileSystemView @ localhost:26754,
  * ref: DeleteSupport.java:32-33, 45-46) with direct storage reads: completed
  * instants are `<ts>.commit` files whose body is the commit-metadata JSON
  * (ref: HoodieTimeline.getInstants/getInstantDetails,
  * DeleteView.java:51-55, 85-87, 196-209). Commits are written atomically
  * (temp file + rename) per SURVEY.md §7.5. All driver-side, metadata-scale:
  * O(#commits) listing, never a data-dir scan.
  */
final class Timeline(val fs: FileSystem, val basePath: Path) {
  val hoodieDir = new Path(basePath, Timeline.MetaDir)

  // Decoded-metadata memo, one parse per timestamp per Timeline instance
  // (ref: cacheMetadata, DeleteView.java:65, 192-217).
  private val memo = mutable.Map.empty[String, CommitMetadata]

  /** Completed instants in timestamp order. */
  def completedInstants(): Seq[Instant] = {
    if (!fs.exists(hoodieDir)) return Seq.empty
    fs.listStatus(hoodieDir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(Timeline.CommitSuffix))
      .map(n => Instant(n.stripSuffix(Timeline.CommitSuffix),
        Instant.CommitAction, Instant.Completed))
      .sortBy(_.ts)
  }

  /** Point lookup of a completed instant (ref: DeleteView.java:51-55). */
  def instantAt(ts: String): Option[Instant] =
    completedInstants().find(_.ts == ts)

  /** Decode the commit metadata for instant `ts` (memoized). */
  def metadata(ts: String): CommitMetadata =
    memo.getOrElseUpdate(ts, {
      val p = new Path(hoodieDir, ts + Timeline.CommitSuffix)
      require(fs.exists(p), s"no completed instant at ts=$ts under $hoodieDir")
      val in = fs.open(p)
      try JsonCodec.fromJson(
        new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8))
      finally in.close()
    })

  /** Atomically record a completed commit: write `<ts>.commit.inflight`,
    * then rename to `<ts>.commit`. */
  def saveCommit(ts: String, meta: CommitMetadata): Unit = {
    fs.mkdirs(hoodieDir)
    val tmp = new Path(hoodieDir, ts + Timeline.CommitSuffix + ".inflight")
    val fin = new Path(hoodieDir, ts + Timeline.CommitSuffix)
    val out = fs.create(tmp, true)
    try out.write(JsonCodec.toJson(meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, fin), s"atomic commit rename failed for $fin")
    memo.remove(ts)
  }

  /** The latest file slice per file group as of `asOf` (inclusive); all
    * completed commits when `asOf` is None. Pure metadata walk. */
  def latestSlices(asOf: Option[String]): Map[String, FileSlice] = {
    val slices = mutable.LinkedHashMap.empty[String, FileSlice]
    completedInstants()
      .filter(i => asOf.forall(i.ts <= _))
      .foreach { i =>
        metadata(i.ts).allStats.foreach { case (part, s) =>
          slices(s.fileId) = FileSlice(part, s.fileId, i.ts, s.path)
        }
      }
    slices.toMap
  }
}

object Timeline {
  val MetaDir = ".hoodie"
  val CommitSuffix = ".commit"

  def apply(conf: Configuration, basePath: String): Timeline = {
    val p = new Path(basePath)
    new Timeline(p.getFileSystem(conf), p)
  }
}
