package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("splitAssign: deterministic, total, and near the declared rates") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = docs.select(col("doc_id"),
      Curation.splitAssign(col("doc_id"), "s1", fr).as("split"))
    val counts = assigned.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    val n = docs.count().toDouble
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == n.toLong) // total: every row assigned
    // 500 docs, binomial noise ~ ±4.5σ bounds — loose but catches a wrong
    // boundary (0.8 vs 0.9) outright
    assert(math.abs(counts("train") / n - 0.8) < 0.1)
    assert(counts.getOrElse("val", 0L) / n < 0.2)
    // determinism: a second evaluation is row-identical
    val again = docs.select(col("doc_id"),
      Curation.splitAssign(col("doc_id"), "s1", fr).as("split"))
    assert(assigned.except(again).count() == 0 &&
      again.except(assigned).count() == 0)
    // a different salt reshuffles membership (not all rows same split)
    val other = docs.select(col("doc_id"),
      Curation.splitAssign(col("doc_id"), "s2", fr).as("split"))
    assert(assigned.join(other, "doc_id")
      .filter(assigned("split") =!= other("split")).count() > 0)
  }

  test("splitAssign: hex boundaries cover the space and stay 8-wide") {
    assert(Curation.hexBound(0.0) == "00000000")
    assert(Curation.hexBound(1.0) == "ffffffff")
    assert(Curation.hexBound(0.8) == "cccccccc")
    val bs = Seq(0.1, 0.25, 0.5, 0.75, 0.9).map(Curation.hexBound)
    assert(bs == bs.sorted && bs.forall(_.length == 8))
  }

  test("packSequences: contiguous intervals, exact chunk spans, " +
    "zero-token and longer-than-cap docs") {
    // shard A: 100 + 600 (spans 2 seqs) + 0-token + 30; shard B: 5
    val df = Seq(
      ("A", 1L, 100L), ("A", 2L, 600L), ("A", 3L, 0L), ("A", 4L, 30L),
      ("B", 9L, 5L)).toDF("shard", "id", "n")
    val out = Curation.packSequences(df, col("shard"), col("id"), col("n"),
      cap = 256L).orderBy("shard", "id")
      .select("shard", "id", "tok_start", "tok_end", "seq_first",
        "seq_last", "n_seqs")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("A", 1L, 0L, 100L, 0L, 0L, 1L), // fits in seq 0
      ("A", 2L, 100L, 700L, 0L, 2L, 3L), // straddles 0,1,2
      ("A", 3L, 700L, 700L, 2L, 2L, 1L), // empty doc at offset 700
      ("A", 4L, 700L, 730L, 2L, 2L, 1L),
      ("B", 9L, 0L, 5L, 0L, 0L, 1L))) // shard B is its own stream
    // invariant on real data: within each shard, tok_start == previous
    // tok_end and seq bounds are exact integer division
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        graft.pipeline.TextAnalysis.bpeishTokenCount(col("text"))
          .cast("long").as("n"))
    val packed = Curation.packSequences(docs, col("lang"), col("doc_id"),
      col("n"), cap = 512L)
    assert(packed.filter(
      col("seq_first") =!= expr("tok_start div 512L") ||
        col("tok_end") - col("tok_start") =!= col("n")).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
    assert(packed.withColumn("prev_end", lag("tok_end", 1, 0L).over(w))
      .filter(col("tok_start") =!= col("prev_end")).count() == 0)
  }

  test("dupNgramPermille: repeats score, prose scores zero, short docs zero") {
    import graft.pipeline.TextAnalysis
    val df = Seq(
      (1L, "batch batch batch batch batch"), // 4 bigrams, 1 distinct
      (2L, "one two three four five"), // no repeats
      (3L, "hi")) // shorter than n: single whole-doc gram
      .toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.dupNgramPermille(col("text"), 2).as("p"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 750L), (2L, 0L), (3L, 0L)))
  }

  test("boilerplateScore: corpus-frequent grams score; unique docs zero; " +
    "threshold is relative to corpus size") {
    // "common gram" appears in 3/4 docs (750 permille >= 500), doc 4 is
    // all-unique text
    val df = Seq(
      (1L, "common gram common gram filler"),
      (2L, "common gram other words here"),
      (3L, "common gram more unique stuff"),
      (4L, "entirely different text body now")).toDF("id", "text")
    val out = Curation.boilerplateScore(df, col("id"), col("text"),
        n = 2, minDfPermille = 500)
      .orderBy("id")
      .select("id", "n_grams", "boilerplate_permille")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1: grams = [common gram, gram common, common gram, gram filler];
    // hot = {common gram} (df 3) -> 2/4 = 500 permille
    assert(out == Seq((1L, 4L, 500L), (2L, 4L, 250L), (3L, 4L, 250L),
      (4L, 4L, 0L)))
    // raising the relative threshold above 3/4 empties the hot set
    val none = Curation.boilerplateScore(df, col("id"), col("text"),
      n = 2, minDfPermille = 900)
    assert(none.filter(col("boilerplate_permille") > 0).count() == 0)
  }

  test("salientTerms: a doc-unique token outranks corpus-wide tokens; " +
      "ranks dense from 1; k bounds output") {
    // 3 docs sharing "common"; each carries a unique marker with higher tf
    val docs = Seq(
      (1L, "common common alpha alpha alpha"),
      (2L, "common common beta beta beta"),
      (3L, "common common gamma gamma gamma")).toDF("id", "text")
    val out = Curation.salientTerms(docs, col("id"), col("text"), k = 2)
      .orderBy("id", "rnk").as[(Long, String, Long, Long, Long, Long)]
      .collect()
    // unique marker: tf=3, df=1 → 3e6 ppm; common: tf=2, df=3 → 666666
    assert(out.length == 6)
    val byDoc = out.groupBy(_._1)
    Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma").foreach {
      case (id, marker) =>
        val rows = byDoc(id).sortBy(_._6)
        assert(rows.map(_._6).toSeq == Seq(1L, 2L)) // dense ranks from 1
        assert(rows.head._2 == marker &&
          rows.head._5 == 3000000L, s"doc $id top term")
        assert(rows(1)._2 == "common" && rows(1)._5 == 666666L)
    }
    // k bounds: k=1 keeps exactly one row per doc
    assert(Curation.salientTerms(docs, col("id"), col("text"), k = 1)
      .count() == 3)
  }

  test("redactPii: each category redacts and counts; clean text untouched") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "mail me at a.user+x@sub.example.org today"),
      (2L, "server 192.168.0.17 timed out"),
      (3L, "ssn 123-45-6789 on file"),
      (4L, "call 555-123-4567 or 555 987 6543"),
      (5L, "no personal data here"),
      (6L, "v1.2.3 released; section 12-34 unchanged")) // lookalikes stay
      .toDF("id", "text")
    val got = TextAnalysis.piiCounts(rows, col("text"))
      .withColumn("red", TextAnalysis.redactPii(col("text")))
      .orderBy("id")
      .select("red", "n_email", "n_ip", "n_id", "n_phone")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got(0) == (("mail me at <EMAIL> today", 1L, 0L, 0L, 0L)))
    assert(got(1) == (("server <IP> timed out", 0L, 1L, 0L, 0L)))
    assert(got(2) == (("ssn <ID> on file", 0L, 0L, 1L, 0L)))
    assert(got(3) == (("call <PHONE> or <PHONE>", 0L, 0L, 0L, 2L)))
    assert(got(4) == (("no personal data here", 0L, 0L, 0L, 0L)))
    assert(got(5) == (("v1.2.3 released; section 12-34 unchanged",
      0L, 0L, 0L, 0L)))
  }

  test("sampleByHash: fraction bounds, determinism, monotone nesting, " +
    "salt independence") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count().toDouble
    // edge fractions are exact
    assert(docs.filter(Curation.sampleByHash(col("doc_id"), "s", 1.0))
      .count() == n.toLong)
    assert(docs.filter(Curation.sampleByHash(col("doc_id"), "s", 0.0))
      .count() == 0)
    val half = docs.filter(Curation.sampleByHash(col("doc_id"), "s", 0.5))
    assert(math.abs(half.count() / n - 0.5) < 0.12)
    // monotone: the 20% sample is a subset of the 50% sample (same salt)
    val fifth = docs.filter(Curation.sampleByHash(col("doc_id"), "s", 0.2))
    assert(fifth.join(half, Seq("doc_id"), "left_anti").count() == 0)
    // different salts draw different members
    val other = docs.filter(Curation.sampleByHash(col("doc_id"), "t", 0.5))
    assert(other.join(half, Seq("doc_id"), "left_anti").count() > 0)
  }

  test("sampleStratified: per-stratum rates, default drops unlisted strata") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val kept = docs.filter(Curation.sampleStratified(col("lang"),
      col("doc_id"), "s", Seq("en" -> 1.0, "de" -> 0.0), default = 0.0))
    val langs = kept.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val enTotal = docs.filter(col("lang") === "en").count()
    assert(langs == Map("en" -> enTotal)) // de at 0, others defaulted out
    // default keeps unlisted strata at its rate
    val all = docs.filter(Curation.sampleStratified(col("lang"),
      col("doc_id"), "s", Seq("en" -> 1.0), default = 1.0))
    assert(all.count() == docs.count())
  }

  test("reservoir: exactly k per stratum, ranks 1..k, stable across runs, " +
    "hash-prefilter composes") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Curation.reservoir(docs, col("lang"), col("doc_id"), "s", 7)
    val perLang = got.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(perLang.values.forall(_ == 7L))
    assert(got.filter(col("sample_rank") < 1 || col("sample_rank") > 7)
      .count() == 0)
    // deterministic: same members and ranks on re-evaluation
    val again = Curation.reservoir(docs, col("lang"), col("doc_id"), "s", 7)
      .select("doc_id", "sample_rank")
    assert(got.select("doc_id", "sample_rank").except(again).count() == 0)
    // membership is hash-prefix monotone: pre-filtering at a generous
    // fraction leaves the same top-k (the documented 100 TB shape)
    val pre = docs.filter(Curation.sampleByHash(col("doc_id"), "s", 0.5))
    val viaPre = Curation.reservoir(pre, col("lang"), col("doc_id"), "s", 7)
      .select("doc_id", "sample_rank")
    assert(got.select("doc_id", "sample_rank").except(viaPre).count() == 0)
  }

  test("mixByBudget: budget bounds hold, greedy-fill overshoot <= one doc, " +
    "unbudgeted domains drop") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        graft.pipeline.TextAnalysis.bpeishTokenCount(col("text"))
          .cast("long").as("n_tok"))
    val budgets = Seq("en" -> 1000L, "de" -> 500L)
    val got = Curation.mixByBudget(docs, col("lang"), col("doc_id"), "s",
      col("n_tok"), budgets)
    val sums = got.groupBy("lang")
      .agg(sum("n_tok").as("tok"), max("n_tok").as("mx"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(sums.keySet == Set("en", "de")) // es/fr/zh unbudgeted -> dropped
    budgets.foreach { case (lang, b) =>
      val (tot, mx) = sums(lang)
      assert(tot - mx < b, s"$lang under budget before its last doc")
      assert(tot >= b, s"$lang budget actually filled")
    }
    // every kept doc's tok_before is under its domain budget
    assert(got.filter(col("lang") === "en" && col("tok_before") >= 1000L)
      .count() == 0)
  }

  test("keepTopQuantile: histogram threshold covers the fraction, keeps " +
    "ties, never sorts the corpus") {
    // scores: 10×90, 5×80, 85×lower — top 10% of 100 rows lands INSIDE the
    // 90-tie block: all ten 90s kept, nothing else
    val df = ((1 to 10).map(i => (i.toLong, 90L)) ++
      (11 to 15).map(i => (i.toLong, 80L)) ++
      (16 to 100).map(i => (i.toLong, i % 50L))).toDF("id", "s")
    val top10 = Curation.keepTopQuantile(df, col("s"), 0.10)
      .select("id").as[Long].collect().toSet
    assert(top10 == (1 to 10).map(_.toLong).toSet)
    // a cut that lands mid-tie keeps the WHOLE tie block: target 12 rows
    // needs the 80s, and all five 80s come along
    val top12 = Curation.keepTopQuantile(df, col("s"), 0.12)
      .select("id").as[Long].collect().toSet
    assert(top12 == (1 to 15).map(_.toLong).toSet)
    // frac = 1 keeps every row
    assert(Curation.keepTopQuantile(df, col("s"), 1.0).count() == 100)
    // real corpus: kept count >= ceil(frac·N), and every kept score >=
    // every dropped score
    val docs = graft.pipeline.TextAnalysis.withQuality(
      spark.read.parquet(s"$sf0001/documents.parquet"), col("text"))
    val kept = Curation.keepTopQuantile(docs, col("quality_score"), 0.2)
    val n = docs.count()
    assert(kept.count() >= math.ceil(0.2 * n).toLong)
    val minKept = kept.agg(min("quality_score")).head().getLong(0)
    assert(docs.filter(col("quality_score") > minKept).count() <=
      kept.count())
  }

  test("keepTopQuantile: a WIDE-RANGE (per-row-unique) score stays exact " +
    "and never plans a corpus-sized single-partition window") {
    // every score distinct over a huge range — the case that used to
    // degrade to a one-task global sort of the whole histogram
    val df = (1 to 5000)
      .map(i => (i.toLong, i.toLong * 1000003L - 2500000000L))
      .toDF("id", "s")
    val res = Curation.keepTopQuantile(df, col("s"), 0.13)
    // unique scores: exactly ceil(0.13*5000)=650 rows, the highest ids
    val got = res.select("id").as[Long].collect().toSet
    assert(got == ((5000 - 649) to 5000).map(_.toLong).toSet)
    // plan audit (tightened r15): NO unpartitioned window anywhere —
    // the bucket offsets now come from a bounded triangle join, so the
    // whole plan is free of single-partition exchanges
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val globals = res.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty,
      s"unpartitioned window in the keepTopQuantile plan:\n$globals")
    // nulls in the score column don't shift the threshold
    val withNulls = df.union(Seq((-1L, 0L), (-2L, 0L)).toDF("id", "s")
      .withColumn("s", lit(null).cast("long")))
    val gotN = Curation.keepTopQuantile(withNulls, col("s"), 0.13)
      .select("id").as[Long].collect().toSet
    assert(gotN == ((5000 - 650) to 5000).map(_.toLong).toSet)
  }

  test("decontaminate: shared n-gram drops the doc; disjoint text survives") {
    val evalDf = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val train = Seq(
      (1L, "totally unrelated text about spark and parquet files here"),
      // shares the 5-gram "quick brown fox jumps over"
      (2L, "she saw a quick brown fox jumps over fences daily"),
      // shares words but never 5 in a row
      (3L, "the dog jumps and the fox is lazy but quick"),
      (4L, "short doc")).toDF("id", "text")
    val kept = Curation.decontaminate(train, col("id"), col("text"),
      evalDf, col("text"), n = 5).select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
    // short-doc convention: a <n-token doc is its own single gram, and an
    // identical short eval doc catches it
    val kept2 = Curation.decontaminate(train, col("id"), col("text"),
      Seq((200L, "short  DOC")).toDF("id", "text"), col("text"), n = 5)
      .select("id").as[Long].collect().toSet
    assert(kept2 == Set(1L, 2L, 3L)) // 4 contaminated (normalized match)
  }
}
