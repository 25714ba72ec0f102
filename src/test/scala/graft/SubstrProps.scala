package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property pins for ExactSubstr: random small-vocabulary corpora (so
  * duplicated windows arise naturally, across docs AND within one) must
  * match an in-memory model of the contract — window counts by exact
  * string, covered-token removal — and the span manifest must account
  * token-for-token for the cuts. */
object SubstrProps extends Properties("Dedup.substr") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  /** In-memory contract model. Tokenization mirrors TextAnalysis.tokens:
    * trim + lowercase + split on whitespace ("" yields one empty token,
    * same as Spark's split). */
  private def model(docs: Seq[(Long, String)], w: Int, minDup: Int)
      : Map[Long, (String, Int, Int)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").toSeq
    }
    val wins = toks.flatMap { case (id, ts) =>
      (0 to ts.size - w).map(i => (id, i, ts.slice(i, i + w).mkString(" ")))
    }
    val counts = wins.groupBy(_._3).map { case (k, v) => k -> v.size }
    val marked = wins.filter(x => counts(x._3) >= minDup)
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    toks.map { case (id, ts) =>
      val mp = marked.getOrElse(id, Set.empty[Int])
      val kept = ts.zipWithIndex
        .filterNot { case (_, i) => mp.exists(p => p <= i && i < p + w) }
        .map(_._1)
      id -> ((kept.mkString(" "), ts.size, ts.size - kept.size))
    }.toMap
  }

  private val vocab = Vector("ab", "cd", "ef", "gh", "ij")
  private val genDoc: Gen[String] =
    Gen.choose(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val genCorpus: Gen[List[(Long, String)]] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, genDoc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  private val genW: Gen[Int] = Gen.choose(2, 4)
  private val genMinDup: Gen[Int] = Gen.choose(2, 3)

  property("substrDedup == in-memory contract model") =
    Prop.forAll(genCorpus, genW, genMinDup) { (corpus, w, minDup) =>
      import spark.implicits._
      val got = Dedup.substrDedup(corpus.toDF("id", "txt"),
          col("id"), col("txt"), w, minDup)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
      val want = model(corpus, w, minDup)
      got == want
    }

  property("substrSpans: disjoint in-doc intervals covering exactly the " +
      "model's removed tokens") =
    Prop.forAll(genCorpus, genW) { (corpus, w) =>
      import spark.implicits._
      val spans = Dedup.substrSpans(corpus.toDF("id", "txt"),
          col("id"), col("txt"), w)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      val want = model(corpus, w, 2)
      val byDoc = spans.groupBy(_._1)
      // spans are disjoint, ordered, in-bounds, and sum to removed count
      byDoc.forall { case (id, ss) =>
        val sorted = ss.sortBy(_._2)
        val disjoint = sorted.sliding(2).forall {
          case Array(a, b) => a._3 < b._2
          case _ => true
        }
        disjoint && sorted.forall(s =>
          s._2 >= 0 && s._3 <= want(id)._2 && s._4 == s._3 - s._2)
      } && want.forall { case (id, (_, _, removed)) =>
        byDoc.get(id).map(_.map(_._4).sum).getOrElse(0) == removed
      }
    }
}
