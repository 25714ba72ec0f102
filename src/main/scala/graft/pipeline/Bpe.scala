package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Self-contained byte-pair-encoding tokenizer (Sennrich et al. 2016):
  * merges are trained from corpus pair counts, tokenization applies them
  * by rank in-row — the model-token counter the packing/budget surface
  * ([[Curation.packSequences]], [[Curation.mixByBudget]]) consumes, so
  * sequence budgets are MODEL tokens, not whitespace words.
  *
  * Training at 100 TB: the pair-count loop runs over the WORD-TYPE table,
  * not the corpus — type counts follow Heaps' law (≈ √(corpus tokens)),
  * and [[trainMerges]] additionally caps the table at `maxTypes` head
  * types by frequency (the tail contributes negligible pair mass). The
  * distributed part is exactly one map-side-combined word count plus a
  * TakeOrdered head; the merge loop itself is driver-side over the
  * bounded type table with an incremental pair index (the reference BPE
  * implementation's own shape — it trains on a word-frequency dict).
  *
  * Determinism: merge selection is (max pair count, then lexicographically
  * smallest pair) — integer counts, so distributed ≡ local training is
  * exact (BpeProps pins it), and the learned merges are embeddable as
  * plan literals / SQL oracle literals.
  *
  * Tokenization contract: words are `TextAnalysis.tokens` units
  * (lower-cased whitespace split); per word, symbols start as characters
  * and the applicable merge with the LOWEST rank is applied at its
  * LEFTMOST occurrence until none applies. Single-occurrence-leftmost
  * iteration is provably identical to the training loop's
  * merge-all-occurrences-left-to-right application (a pair created by a
  * merge can only belong to a LATER-ranked merge, so the current minimum
  * keeps priority until exhausted) — BpeProps pins the equivalence, and
  * the `q_bpe_tokens` DuckDB oracle replays exactly this single-step
  * recursion. */
object Bpe {

  /** In-memory reference trainer: `numMerges` (left, right) merges from a
    * word-frequency table. Selection per round: highest weighted pair
    * count, ties to the lexicographically smallest (left, right). Stops
    * early when no pair remains. */
  def trainMergesLocal(wordFreq: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0 (got $numMerges)")
    val words = wordFreq.map { case (w, f) =>
      (scala.collection.mutable.ArrayBuffer.from(
        w.map(_.toString)), f)
    }.toArray
    // pair -> weighted count, plus pair -> word indices containing it
    // (incremental maintenance: a merge only touches words that held it)
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    val index = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def pairsOf(syms: collection.Seq[String]): Iterator[(String, String)] =
      if (syms.size < 2) Iterator.empty
      else syms.iterator.zip(syms.iterator.drop(1))
    def add(wi: Int): Unit = {
      val (syms, f) = words(wi)
      pairsOf(syms).foreach { p =>
        counts.updateWith(p)(c => Some(c.getOrElse(0L) + f))
        index.getOrElseUpdate(p,
          scala.collection.mutable.Set.empty) += wi
      }
    }
    def remove(wi: Int): Unit = {
      val (syms, f) = words(wi)
      pairsOf(syms).foreach { p =>
        counts.updateWith(p)(c =>
          c.map(_ - f).filter(_ != 0L))
        index.get(p).foreach { s => s -= wi; if (s.isEmpty) index -= p }
      }
    }
    words.indices.foreach(add)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges && counts.nonEmpty) {
      val best = counts.iterator.reduceLeft { (a, b) =>
        if (a._2 > b._2) a
        else if (a._2 < b._2) b
        else if (implicitly[Ordering[(String, String)]].lteq(a._1, b._1)) a
        else b
      }._1
      merges += best
      val touched = index(best).toArray
      touched.foreach { wi =>
        remove(wi)
        val (syms, f) = words(wi)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == best._1 &&
              syms(i + 1) == best._2) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        words(wi) = (out, f)
        add(wi)
      }
      round += 1
    }
    merges.toSeq
  }

  /** Distributed trainer: one map-side-combined word-type count over the
    * corpus, TakeOrdered head of `maxTypes` types by (count desc, word
    * asc), then the driver merge loop. Exact-integer ≡
    * [[trainMergesLocal]] on the same counts (BpeProps). */
  def trainMerges(df: DataFrame, text: Column, numMerges: Int,
      maxTypes: Int = 1 << 20): Seq[(String, String)] = {
    val types = graft.util.ParallelScan.widen(
        df.select(TextAnalysis.tokens(text).as("t")))
      .select(explode_outer(col("t")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc).limit(maxTypes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    trainMergesLocal(types, numMerges)
  }

  /** BPE tokens of the whole text (words split as `TextAnalysis.tokens`,
    * each tokenized under `merges`, concatenated in order) — a native
    * in-row expression, no UDF. */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeTokens.bpeTokens(text, merges)

  /** Per-document model-token count under `merges` — the drop-in
    * replacement for whitespace/bpe-ish counts in the packing, mixture,
    * and budget operators. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(tokens(text, merges))

  /** The fixture tokenizer vocabulary: the bench corpus's closed word set
    * with deterministic weights — a data-independent constant so the
    * trained merges can be embedded as literals on BOTH engines
    * (production trains with [[trainMerges]] on the corpus itself; the
    * oracle-gated queries need constants because the driver's oracle SQL
    * is fixed per query). */
  val SeedWordFreq: Seq[(String, Long)] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")
    .zipWithIndex.map { case (w, i) => w -> (1L + (i * 7) % 13) }

  /** 40 merges trained on [[SeedWordFreq]] — the constant the
    * `q_bpe_tokens` / `q_pack_bpe` gates and their SQL oracles share. */
  lazy val SeedMerges: Seq[(String, String)] =
    trainMergesLocal(SeedWordFreq, 40)

  /** CORPUS-trained merges, cached per source key (one training pass per
    * table per JVM — repeat callers and the bench's warm passes reuse
    * the learned table). [[lastTrained]] exposes the most recent result
    * so the oracle-SQL generator — a `def`, rendered AFTER the queries
    * run in `graft.Verify` — can embed the SAME learned literals the
    * query tokenized with: the SeedMerges embedding mechanism pointed at
    * trained output (`q_bpe_tokens_trained`). Training is
    * integer-deterministic in the data (count desc, word asc type head;
    * max-count lexicographic merge selection), so query and oracle agree
    * even across separate JVMs over the same corpus. */
  private val trainedCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(String, String)]]()
  @volatile private var lastKey: Option[String] = None

  def trainedFor(df: DataFrame, text: Column, key: String,
      numMerges: Int = 48, maxTypes: Int = 1 << 20)
      : Seq[(String, String)] = {
    val m = trainedCache.computeIfAbsent(key,
      _ => trainMerges(df, text, numMerges, maxTypes))
    lastKey = Some(key)
    m
  }

  /** The most recently [[trainedFor]]-returned merges, if any. */
  def lastTrained: Option[Seq[(String, String)]] =
    lastKey.flatMap(k => Option(trainedCache.get(k)))
}
