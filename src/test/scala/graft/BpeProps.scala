package graft

import graft.pipeline.Bpe
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property pins for the self-contained BPE tokenizer: random
  * small-alphabet corpora (so pair collisions and multi-char merges arise
  * naturally) must train identically distributed vs in-memory, tokenize
  * identically to an independent in-memory model, reconstruct the input
  * losslessly, and — the equivalence the SQL oracle's recursion relies
  * on — single-step leftmost-lowest-rank application must equal the
  * training loop's merge-all-occurrences batch application. */
object BpeProps extends Properties("Bpe") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genWord: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
  private val genDoc: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
  private val genCorpus: Gen[Seq[String]] =
    Gen.chooseNum(3, 20).flatMap(n => Gen.listOfN(n, genDoc))

  /** Independent in-memory tokenizer: leftmost occurrence of the
    * lowest-ranked applicable merge, repeated. */
  private def tokenizeModel(word: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.size <= 1
    while (!done) {
      val cands = syms.indices.dropRight(1)
        .flatMap(i => ranks.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (cands.isEmpty) done = true
      else {
        // lowest rank, then leftmost
        val (_, pos) = cands.minBy(identity)
        syms = (syms.take(pos) :+ (syms(pos) + syms(pos + 1))) ++
          syms.drop(pos + 2)
        done = syms.size <= 1
      }
    }
    syms
  }

  /** The training loop's application: each merge in rank order, ALL
    * occurrences left-to-right in one pass. */
  private def tokenizeBatch(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    for (m <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == m._1 && syms(i + 1) == m._2) {
          out += syms(i) + syms(i + 1); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  property("distributed trainMerges == in-memory trainer on exact " +
      "type counts") = Prop.forAll(genCorpus,
      Gen.chooseNum(0, 15)) { (corpus, numMerges) =>
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Bpe.trainMerges(df, col("text"), numMerges)
    val freq = corpus.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }.toSeq
    val want = Bpe.trainMergesLocal(freq, numMerges)
    Prop(got == want) :| s"got=$got want=$want"
  }

  property("BpeTokens column == in-memory model; lossless; single-step " +
      "leftmost == batch application") = Prop.forAll(genCorpus,
      Gen.chooseNum(1, 15)) { (corpus, numMerges) =>
    import spark.implicits._
    val freq = corpus.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }.toSeq
    val merges = Bpe.trainMergesLocal(freq, numMerges)
    val ranks = merges.zipWithIndex.toMap
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        Bpe.tokens(col("text"), merges).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq)
      .toMap
    val checks = corpus.zipWithIndex.map { case (t, i) =>
      val words = t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      val want = words.toSeq.flatMap(tokenizeModel(_, ranks))
      val batch = words.toSeq.flatMap(tokenizeBatch(_, merges))
      (Prop(got(i.toLong) == want) :| s"doc $i: ${got(i.toLong)} != $want") &&
        (Prop(want == batch) :| s"doc $i: leftmost $want != batch $batch") &&
        (Prop(want.mkString == words.mkString) :| s"doc $i not lossless")
    }
    checks.reduce(_ && _)
  }
}
