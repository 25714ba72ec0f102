package graft

import graft.format.{Bloom, MetaCols, Timeline}
import graft.read.SnapshotReader
import graft.write.{CowWriter, MorWriter, TableMaintenance}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file bloom skipping index: equality lookups on high-cardinality
  * payload columns drop files at planning time where min/max ranges are
  * blind. No-false-negative soundness pinned at the primitive level. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
    scans.head.relation.location
      .listFiles(scans.head.partitionFilters, scans.head.dataFilters)
      .map(_.files.length).sum
  }

  test("primitives: no false negatives; encode/decode/merge roundtrip") {
    val b = Bloom.empty(bits = 1 << 10, k = 5)
    val vals = (1 to 200).map(i => UTF8String.fromString(s"v$i"))
    vals.foreach(Bloom.add(b, _))
    assert(vals.forall(Bloom.mightContain(b, _)), "false negative!")
    // roundtrip through the commit-JSON encoding
    val dec = Bloom.decode(Bloom.encode(b))
    assert(dec.exists(_.sameElements(b)))
    // merge is union: an element of either side is in the merge
    val b1 = Bloom.empty(1 << 10, 5); Bloom.add(b1, vals.head)
    val b2 = Bloom.empty(1 << 10, 5); Bloom.add(b2, vals.last)
    val m = Bloom.merge(b1, b2)
    assert(Bloom.mightContain(m, vals.head) &&
      Bloom.mightContain(m, vals.last))
    // corrupted storage decodes to None (skipping stays conservative)
    assert(Bloom.decode("!!notbase64!!").isEmpty)
    assert(Bloom.decode(java.util.Base64.getEncoder
      .encodeToString("junk".getBytes)).isEmpty)
  }

  // c spreads pseudo-randomly so EVERY file's [min,max] spans nearly the
  // whole domain — range stats are blind, only the bloom can skip
  private def rowsC(n: Int) = (1 to n).map { i =>
    (i.toLong, s"p${i % 2}", (i * 1000) % 997)
  }.toDF("k", "p", "c")

  test("COW: equality on a bloom column skips files min/max cannot") {
    val dir = freshDir("bloom_cow")
    val w = new CowWriter(spark, dir, numBuckets = 4,
      statsCols = Seq("c"), bloomCols = Seq("c"), bloomBits = 1 << 14)
    w.insert(rowsC(400), $"k", $"p", Fixtures.C1)
    val snap = SnapshotReader.read(spark, dir)
    val total = snap.inputFiles.length
    assert(total == 8)

    // positive control: every file's recorded [min,max] covers a mid value
    // (the ranges alone cannot skip) — asserted via a range-only proxy:
    // a BETWEEN keeps every file
    assert(plannedFiles(snap.filter($"c".between(400, 600))) == total)

    // present value: found, and fewer files planned than the table
    val some = rowsC(400).select("c").as[Int].head()
    val hit = snap.filter($"c" === some)
    assert(hit.count() >= 1)
    assert(plannedFiles(hit) < total,
      s"bloom should skip: planned ${plannedFiles(hit)} of $total")

    // absent value INSIDE every file's range: bloom proves absence → zero
    // files planned (ranges alone would keep all 8)
    val used = rowsC(400).select("c").as[Int].collect().toSet
    val absent = (0 until 997).find(v => !used.contains(v) &&
      v > used.min && v < used.max).get
    val miss = snap.filter($"c" === absent)
    assert(plannedFiles(miss) == 0 && miss.count() == 0)

    // IN-list: union of members' blooms; all-absent IN plans zero files
    val absent2 = (0 until 997).find(v => !used.contains(v) &&
      v > used.min && v < used.max && v != absent).get
    assert(plannedFiles(snap.filter($"c".isin(absent, absent2))) == 0)
    assert(plannedFiles(snap.filter($"c".isin(some, absent))) ==
      plannedFiles(hit))

    // range predicates never consult the bloom (kept: membership is not
    // an interval question) — correctness unchanged
    assert(snap.filter($"c" >= 0).count() == 400)
  }

  test("blooms survive upsert rewrites and layout rewrites") {
    val dir = freshDir("bloom_rewrite")
    rowsC(300).write.format("graft")
      .option("key", "k").option("partition", "p")
      .option("buckets", "4").option("blooms", "c")
      .option("bloomBits", (1 << 14).toString)
      .option("ts", Fixtures.C1).save(dir)
    // append resolves bloom config from commit metadata (no options)
    rowsC(300).filter($"k" % 11 === 0).withColumn("c", lit(2000))
      .write.format("graft").mode("append")
      .option("ts", Fixtures.C2).save(dir)
    val snap = SnapshotReader.read(spark, dir)
    // rewritten slices carry fresh blooms: new value found, planned subset
    val hit = snap.filter($"c" === 2000)
    assert(hit.count() == (1 to 300).count(_ % 11 == 0))
    // the append touched every group (27 keys over 4 buckets), so no file
    // skips for 2000 — but an absent value still plans ZERO files, proving
    // the REWRITTEN slices carry fresh blooms
    val used0 = rowsC(300).select("c").as[Int].collect().toSet
    val absent0 = (0 until 997).find(v => !used0.contains(v) &&
      v > used0.min && v < used0.max).get
    assert(plannedFiles(snap.filter($"c" === absent0)) == 0)

    // sort layout keeps the bloom index (re-recorded on rewritten files)
    TableMaintenance.sortLayout(spark, dir, Fixtures.C3, Seq("c"))
    val snap3 = SnapshotReader.read(spark, dir)
    val used = rowsC(300).select("c").as[Int].collect().toSet
    val absent = (0 until 997).find(v => !used.contains(v) &&
      v > used.min && v < used.max).get
    assert(plannedFiles(snap3.filter($"c" === absent)) == 0)
    assert(snap3.filter($"c" === 2000).count() ==
      (1 to 300).count(_ % 11 == 0))
  }

  test("declared bloom columns get PARQUET-NATIVE blooms in every file") {
    import scala.jdk.CollectionConverters._
    val dir = freshDir("bloom_native")
    val w = new CowWriter(spark, dir, numBuckets = 2,
      statsCols = Seq("c"), bloomCols = Seq("c"), bloomBits = 1 << 14)
    w.insert(rowsC(200), $"k", $"p", Fixtures.C1)
    val conf = spark.sessionState.newHadoopConf()
    val files = SnapshotReader.read(spark, dir).inputFiles
    assert(files.length == 4)
    files.foreach { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), conf))
      try {
        val block = r.getFooter.getBlocks.get(0)
        val byName = block.getColumns.asScala
          .map(c => c.getPath.toDotString -> c).toMap
        // declared column: a native bloom is written into the file — any
        // parquet reader with filter pushdown prunes row groups by it.
        // (This data's chunks are plain-encoded; parquet deliberately
        // omits the bloom for fully dictionary-encoded chunks, where the
        // dictionary already answers membership exactly.)
        assert(byName("c").getBloomFilterOffset >= 0,
          s"no native bloom for 'c' in $f")
        assert(r.getBloomFilterDataReader(block)
          .readBloomFilter(byName("c")) != null)
        // undeclared column: no bloom (no per-column write cost paid)
        assert(byName("k").getBloomFilterOffset < 0)
      } finally r.close()
    }
    // behavioral: equality reads through the native-bloom files stay exact
    val snap = SnapshotReader.read(spark, dir)
    val some = rowsC(200).select("c").as[Int].head()
    assert(snap.filter($"c" === some).count() ==
      rowsC(200).filter($"c" === some).count())
  }

  test("MOR: bloom skipping composes with slice share-fate") {
    val dir = freshDir("bloom_mor")
    val w = new MorWriter(spark, dir, numBuckets = 4,
      statsCols = Seq("c"), bloomCols = Seq("c"), bloomBits = 1 << 14)
    w.insert(rowsC(200), $"k", $"p", Fixtures.C1)
    w.upsert(rowsC(200).filter($"k" % 13 === 0).withColumn("c", lit(3000)),
      $"k", $"p", Fixtures.C2)
    val snap = SnapshotReader.read(spark, dir)
    // merged correctness with outstanding deltas
    assert(snap.filter($"c" === 3000).count() ==
      (1 to 200).count(_ % 13 == 0))
    // a value absent from EVERY file (base and deltas) returns nothing
    val used = rowsC(200).select("c").as[Int].collect().toSet
    val absent = (0 until 997).find(v => !used.contains(v) &&
      v > used.min && v < used.max).get
    assert(snap.filter($"c" === absent).count() == 0)
  }
}
