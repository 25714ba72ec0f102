package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property-based check of the r17 takedown arithmetic: random word-soup
  * docs ingested in two arrival batches, a random subset deleted with
  * its as-ingested text — the surviving segment index must equal the
  * in-memory recount over the surviving docs exactly (subtraction
  * exact; fully-zeroed segments leave no row; empty delete sets are
  * no-ops). */
object SegDeleteProps extends Properties("Dedup.segDelete") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private val genDoc: Gen[String] = for {
    n <- Gen.choose(3, 14)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def segsOf(text: String, w: Int): Seq[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    (0 until toks.size / w).map(i =>
      toks.slice(i * w, i * w + w).mkString(" "))
  }

  property("index counts == in-memory recount over surviving docs") =
    Prop.forAll(Gen.listOfN(10, genDoc),
      Gen.listOfN(10, Gen.oneOf(true, false))) { (docs, delMask) =>
      import spark.implicits._
      val w = 3
      val dir = java.nio.file.Files
        .createTempDirectory("graft_segdel_prop").toString
      try {
        def frame(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
        val all = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val (b1, b2) = all.splitAt(5)
        Dedup.segIngest(spark, dir, frame(b1), col("doc_id"),
          col("text"), width = w, ts = Some("1000")): Unit
        Dedup.segIngest(spark, dir, frame(b2), col("doc_id"),
          col("text"), width = w): Unit
        val deleted = all.zip(delMask).collect { case (d, true) => d }
        Dedup.segDelete(spark, dir, frame(deleted), col("doc_id"),
          col("text"), width = w): Unit
        val got = graft.read.SnapshotReader
          .read(spark, s"$dir/segindex")
          .select($"seg", $"cnt").as[(String, Long)].collect().toMap
        val surviving = all.zip(delMask).collect { case (d, false) => d }
        val want = surviving.flatMap(d => segsOf(d._2, w))
          .groupBy(identity).map { case (s, o) => s -> o.size.toLong }
        (got == want) :| s"index $got != model $want (deleted ${
          deleted.map(_._1)})"
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir)): Unit
      }
    }
}
