package graft.write

import graft.format.MetaCols
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared file-slice materialization for the COW and MOR writers.
  *
  * Writes one parquet file per (partition, fileId) group in a single
  * distributed job: hash-repartition on the group columns, partitioned write
  * to a temp dir, then driver-side renames (metadata-only FS ops, one per
  * written group — the same O(#touched file groups) driver scale Hudi plans
  * at) into `<part>/<fileName(fid, ts)>`.
  */
private[write] object SliceFiles {
  import CowWriter.FidCol
  private val PartDirCol = "__graft_part"

  /** Returns (partition, fileId) -> (relative path, row count). */
  def write(fs: FileSystem, basePath: String, data: DataFrame, ts: String,
      fileName: (String, String) => String)
      : Map[(String, String), (String, Long)] = {
    val tmp = new Path(basePath, s".tmp_$ts")
    fs.delete(tmp, true)

    val withDirs = data
      .withColumn(PartDirCol, col(MetaCols.PartitionPath))
      // FidCol doubles as the partitionBy column; it is dropped from file
      // contents by partitionBy, which is what we want (helper only).
      .repartition(col(PartDirCol), col(FidCol))

    withDirs.write
      .partitionBy(PartDirCol, FidCol)
      .parquet(tmp.toString)

    // Row counts per group — distributed agg with map-side combine; result is
    // metadata-sized (#groups rows).
    val counts = data.groupBy(MetaCols.PartitionPath, FidCol).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val out = scala.collection.mutable.Map.empty[(String, String), (String, Long)]
    val partDirs = if (fs.exists(tmp)) fs.listStatus(tmp).filter(_.isDirectory)
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    partDirs.foreach { pd =>
      val part = dirValue(pd.getPath.getName)
      fs.listStatus(pd.getPath).filter(_.isDirectory).foreach { fd =>
        val fid = dirValue(fd.getPath.getName)
        val files = fs.listStatus(fd.getPath)
          .filter(f => f.getPath.getName.startsWith("part-"))
        require(files.length == 1,
          s"expected exactly 1 file for group $fid, got ${files.length}")
        val destDir = if (part.isEmpty) new Path(basePath)
          else new Path(basePath, part)
        fs.mkdirs(destDir)
        val name = fileName(fid, ts)
        val dest = new Path(destDir, name)
        fs.delete(dest, false)
        require(fs.rename(files.head.getPath, dest), s"rename to $dest failed")
        val rel = if (part.isEmpty) name else s"$part/$name"
        out((part, fid)) = (rel, counts.getOrElse((part, fid), 0L))
      }
    }
    fs.delete(tmp, true)
    out.toMap
  }

  private def dirValue(dirName: String): String = {
    val v = dirName.substring(dirName.indexOf('=') + 1)
    java.net.URLDecoder.decode(v, "UTF-8")
  }
}
