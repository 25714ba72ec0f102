package graft

import graft.format.Timeline
import graft.write.{CowWriter, TableMaintenance}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** MEASURED row-group evidence for the layout rewrites' 100 TB claims:
  * with multi-row-group files (small parquet block size), a sort layout
  * produces DISJOINT row-group ranges on the sort column (each range
  * predicate reads ~1 group), and a Z-ORDER layout produces NARROW
  * row-group ranges on EVERY z column simultaneously — which a
  * lexicographic sort cannot do for its trailing columns. */
class LayoutEvidenceSpec extends SparkSpec {
  import spark.implicits._

  // one partition, 2 buckets: few files, many rows each → many row
  // groups per file at a 16 KiB block size. a and b are DECORRELATED
  // (hash-scrambled) — correlated columns would let a lexicographic sort
  // accidentally order both and mask the z-order comparison.
  private def rowsAB(n: Int) = (1 to n).map { i =>
    val h = java.lang.Long.reverse(i.toLong * 0x9E3779B97F4A7C15L)
    (i.toLong, "p", (i * 37) % 1000, math.floorMod(h, 1000L).toInt)
  }.toDF("k", "p", "a", "b")

  /** Per-row-group [min,max] of an int column across a file's groups. */
  private def rowGroupRanges(path: String,
      colName: String): Seq[(Int, Int)] = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      spark.sessionState.newHadoopConf())
    val r = ParquetFileReader.open(in)
    try r.getFooter.getBlocks.asScala.toSeq.map { b =>
      val cc = b.getColumns.asScala
        .find(_.getPath.toDotString == colName).get
      val st = cc.getStatistics
      (st.genericGetMin.asInstanceOf[Number].intValue(),
        st.genericGetMax.asInstanceOf[Number].intValue())
    } finally r.close()
  }

  private def latestFiles(dir: String): Seq[String] = {
    val tl = Timeline(spark.sessionState.newHadoopConf(), dir)
    tl.latestSlices(None).values.flatMap(_.relPath)
      .map(rel => s"$dir/$rel").toSeq
  }

  private def withSmallRowGroups[T](body: => T): T = {
    val hc = spark.sparkContext.hadoopConfiguration
    val old = hc.get("parquet.block.size")
    hc.set("parquet.block.size", (16 * 1024).toString)
    try body
    finally if (old == null) hc.unset("parquet.block.size")
    else hc.set("parquet.block.size", old)
  }

  test("sorted files have DISJOINT row-group ranges on the sort column") {
    val dir = freshDir("evidence_sort")
    withSmallRowGroups {
      val w = new CowWriter(spark, dir, numBuckets = 2)
      w.insert(rowsAB(60000), $"k", $"p", Fixtures.C1)
      TableMaintenance.sortLayout(spark, dir, Fixtures.C2, Seq("a"))
    }
    val perFile = latestFiles(dir).map(rowGroupRanges(_, "a"))
    assert(perFile.exists(_.size >= 3),
      s"need multi-row-group files, got ${perFile.map(_.size)}")
    perFile.foreach { ranges =>
      ranges.sliding(2).foreach {
        case Seq((_, hi), (lo, _)) =>
          assert(hi <= lo, s"row groups overlap: $ranges")
        case _ => ()
      }
    }
  }

  test("z-ordered files have NARROW row-group ranges on BOTH columns") {
    val sortDir = freshDir("evidence_lex")
    val zDir = freshDir("evidence_z")
    withSmallRowGroups {
      val ws = new CowWriter(spark, sortDir, numBuckets = 2)
      ws.insert(rowsAB(120000), $"k", $"p", Fixtures.C1)
      TableMaintenance.sortLayout(spark, sortDir, Fixtures.C2, Seq("a"))
      val wz = new CowWriter(spark, zDir, numBuckets = 2)
      wz.insert(rowsAB(120000), $"k", $"p", Fixtures.C1)
      TableMaintenance.zorderLayout(spark, zDir, Fixtures.C2,
        Seq("a", "b"), bits = 6)
    }
    // average row-group range width as a fraction of the file-wide range
    def avgWidth(dir: String, colName: String): Double = {
      val widths = latestFiles(dir).flatMap { f =>
        val ranges = rowGroupRanges(f, colName)
        val fileLo = ranges.map(_._1).min
        val fileHi = ranges.map(_._2).max
        val span = math.max(1, fileHi - fileLo)
        ranges.map { case (lo, hi) => (hi - lo).toDouble / span }
      }
      widths.sum / widths.size
    }
    val la = avgWidth(sortDir, "a"); val lb = avgWidth(sortDir, "b")
    val za = avgWidth(zDir, "a"); val zb = avgWidth(zDir, "b")
    info(f"avg row-group range widths: lex a=$la%.2f b=$lb%.2f | " +
      f"zorder a=$za%.2f b=$zb%.2f")
    // lexicographic sort: leading column narrow, TRAILING column ~full
    assert(la < 0.35, s"lex leading col not narrow: $la")
    assert(lb > 0.8, s"lex trailing col should span (unordered): $lb")
    // z-order: BOTH columns substantially narrower than the trailing
    // lex column — each row group covers a small (a,b) box
    assert(za < 0.7 && zb < 0.7,
      s"z-order row groups not narrow in both dims: a=$za b=$zb")
    // and a two-sided box predicate intersects FEWER z row groups than
    // lexicographic row groups (the pruning this layout buys)
    def hits(dir: String): Int = latestFiles(dir).map { f =>
      val ra = rowGroupRanges(f, "a"); val rb = rowGroupRanges(f, "b")
      ra.zip(rb).count { case ((alo, ahi), (blo, bhi)) =>
        alo <= 300 && ahi >= 200 && blo <= 300 && bhi >= 200
      }
    }.sum
    info(s"box-predicate row-group hits: zorder=${hits(zDir)} " +
      s"lex=${hits(sortDir)}")
    assert(hits(zDir) < hits(sortDir),
      s"z-order box hits ${hits(zDir)} !< lex ${hits(sortDir)}")
  }
}
