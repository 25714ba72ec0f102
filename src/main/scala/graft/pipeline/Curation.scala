package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * train/val/test splitting, GPT-style sequence packing, and eval-set
  * decontamination.
  *
  * Like [[TextAnalysis]], everything here is built from
  * `org.apache.spark.sql.functions` (whole-stage codegen, no UDFs) and each
  * computation has an exact ANSI-SQL twin used as the DuckDB oracle
  * (SparkEntry.oracleSql) — md5 hex, window sums, and integer division are
  * bit-identical across engines, so the assignments are not just "similar",
  * they hash-match.
  *
  * Scale shapes (the part that matters at 100 TB):
  *  - split: per-row, zero shuffle — a pure projection that fuses into
  *    whatever scan precedes it.
  *  - packing: ONE shuffle (hash by shard) + an in-partition sort; shards
  *    (source, crawl date, language...) bound the window so no global
  *    ordering is ever materialized.
  *  - decontamination: the eval side is tiny by construction (a benchmark
  *    suite, not a corpus) — its distinct-gram set broadcasts, and the
  *    train side streams through one codegen'd explode + broadcast-hash
  *    semi-join probe. No shuffle of the corpus.
  */
object Curation {

  /** 8-hex-digit lower-case boundary for a cumulative fraction of the
    * 32-bit hash space: floor(cum · 2³²) rendered like md5's own hex. */
  private[graft] def hexBound(cum: Double): String =
    f"${math.min((cum * 4294967296.0).toLong, 0xFFFFFFFFL)}%08x"

  /** Deterministic hash-range split assignment: the first 8 hex chars of
    * md5(key ⊕ salt) land in [0, 2³²) uniformly; cumulative fraction
    * boundaries carve that space into named splits. Lexicographic
    * comparison of the fixed-width lower-case hex prefix IS the numeric
    * comparison, so the same expression runs unchanged in any engine with
    * md5 — membership is a property of (key, salt) alone: stable across
    * runs, machines, partitionings, and engine versions, and new data
    * lands in splits at the declared rates without any coordination.
    *
    * `fractions` are (name, fraction) in declaration order and must sum to
    * 1; the last split takes everything at-or-after its lower boundary.
    */
  def splitAssign(key: Column, salt: String,
      fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val prefix = substring(md5(concat(key.cast("string"), lit("|" + salt))), 1, 8)
    val cums = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    // when-chain over upper boundaries; the final split is the otherwise.
    fractions.init.zip(cums.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cum)) =>
        val cond = prefix < lit(hexBound(cum))
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
      }
      .fold(lit(fractions.head._1))(_.otherwise(lit(fractions.last._1)))
  }

  /** Deterministic hash-sample membership: true iff md5(key ⊕ salt) lands
    * in the first `fraction` of the 32-bit hash space — the same
    * fixed-width-hex comparison as [[splitAssign]], so membership is a pure
    * per-row function of (key, salt): zero shuffle, stable across runs and
    * engines, and composable (a 10% sample of a 50% sample under different
    * salts is an independent 5%). */
  def sampleByHash(key: Column, salt: String, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    if (fraction >= 1.0) lit(true)
    else substring(md5(concat(key.cast("string"), lit("|" + salt))), 1, 8) <
      lit(hexBound(fraction))
  }

  /** Per-stratum hash-sample membership — the stratified-sampling filter a
    * mixture pipeline applies before training (CCNet-style per-language /
    * per-source rates). `fractions` maps stratum values to keep rates;
    * strata not listed keep at `default`. Still per-row and zero-shuffle:
    * the stratum only selects WHICH boundary the row's hash is compared
    * against, so the filter fuses into the scan like any other predicate. */
  def sampleStratified(stratum: Column, key: Column, salt: String,
      fractions: Seq[(String, Double)], default: Double = 0.0): Column = {
    require(fractions.nonEmpty, "at least one stratum")
    val prefix = substring(md5(concat(key.cast("string"), lit("|" + salt))), 1, 8)
    def keep(f: Double): Column = {
      require(f >= 0.0 && f <= 1.0, "fraction in [0,1]")
      if (f >= 1.0) lit(true) else prefix < lit(hexBound(f))
    }
    fractions.foldLeft(Option.empty[Column]) { case (acc, (name, f)) =>
      val arm = when(stratum === name, keep(f))
      Some(acc.fold(arm)(c => c.when(stratum === name, keep(f))))
    }.get.otherwise(keep(default))
  }

  /** Deterministic "reservoir": the `k` rows of each stratum whose hash
    * ranks lowest — a fixed-size uniform sample per stratum that any two
    * runs (or engines) agree on exactly. Adds `sample_rank` (1-based hash
    * rank within the stratum; ties broken by key).
    *
    * ONE shuffle by stratum. The window sorts within each stratum, so a
    * stratum must fit a task's spill budget — at 100 TB with few huge
    * strata, pre-filter with [[sampleByHash]] at a generous fraction
    * (≥ k / expected-stratum-rows) first: membership is hash-prefix
    * monotone, so the top-k by hash of the pre-filtered stratum is the
    * top-k of the whole stratum whenever the filter keeps ≥ k rows. */
  def reservoir(df: DataFrame, stratum: Column, key: Column, salt: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col("__stratum"))
      .orderBy(col("__hk").asc, col("__key").asc)
    df.withColumn("__stratum", stratum)
      .withColumn("__key", key)
      .withColumn("__hk", md5(concat(key.cast("string"), lit("|" + salt))))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop("__stratum", "__key", "__hk")
  }

  /** Token-budget corpus mixture (the data-mixing step of a pretraining
    * run): per domain, take documents in deterministic hash order until the
    * domain's token budget is met — a document is kept iff the tokens
    * BEFORE it in its domain's hash-ordered stream are under the budget
    * (so each domain overshoots by at most one document, exactly like the
    * greedy fill loop). Domains without a budget default to `default`
    * (0 = drop). Adds `tok_before` (tokens ahead of this doc in its
    * domain's stream) and keeps only budgeted rows.
    *
    * ONE shuffle by domain; the cumulative sum is a window over the
    * domain's hash order, never a global sort. Budgets are data, not plan
    * shape — rescaling the mixture re-runs the same plan. */
  def mixByBudget(df: DataFrame, domain: Column, key: Column, salt: String,
      nTokens: Column, budgets: Seq[(String, Long)],
      default: Long = 0L): DataFrame = {
    require(budgets.nonEmpty, "at least one domain budget")
    val budget = budgets.foldLeft(Option.empty[Column]) {
      case (acc, (name, b)) =>
        val arm = when(col("__dom") === name, lit(b))
        Some(acc.fold(arm)(c => c.when(col("__dom") === name, lit(b))))
    }.get.otherwise(lit(default))
    val w = Window.partitionBy(col("__dom"))
      .orderBy(col("__hk").asc, col("__key").asc)
    df.withColumn("__dom", domain)
      .withColumn("__key", key)
      .withColumn("__hk", md5(concat(key.cast("string"), lit("|" + salt))))
      .withColumn("__n", nTokens.cast("long"))
      .withColumn("tok_before", sum(col("__n")).over(w) - col("__n"))
      .filter(col("tok_before") < budget)
      .drop("__dom", "__key", "__hk", "__n")
  }

  /** Keep the rows whose INTEGER score ranks in the top `frac` of the
    * corpus — WITHOUT a global sort. The quantile threshold resolves from
    * a per-score-value histogram (one map-side-combined aggregate), whose
    * descending cumulative sum is computed as a DISTRIBUTED two-level
    * prefix sum: the histogram is range-repartitioned on the score, each
    * range partition cumulates locally, and the per-partition totals
    * (≤ `histPartitions` rows, bounded BY CONSTRUCTION — collected and
    * prefix-summed on the driver, re-entering as a literal frame)
    * provide the cross-partition offsets. The resulting threshold
    * broadcasts back as a filter. Ties
    * at the threshold are all kept (the smallest threshold whose tail
    * covers ⌈frac·N⌉ rows), so the result is deterministic and
    * engine-exact — unlike `ORDER BY score LIMIT k`, which is both a
    * global sort and tie-ambiguous.
    *
    * The corpus count and the bucket boundaries both derive from the
    * MATERIALIZED histogram (one metadata-sized aggregate over it,
    * collected and baked into the plan as literals) — so the bucket id
    * is a PURE FUNCTION of the score, never a physical-partition
    * artifact, and the boundary approximation only shapes load balance,
    * never the result.
    *
    * 100 TB shape (r17): the SCORE EXPRESSION evaluates over the corpus
    * exactly TWICE — once building the histogram, once in the final
    * broadcast-compare filter (for trained-quality scores each
    * evaluation is a text-feature pass, which dominates everything
    * else; the r16 shape re-evaluated it in four separate jobs). In
    * between: a histogram-sized (distinct score values — possibly
    * corpus-ROW-sized for unique scores, but two longs per row, never
    * wider) eager materialization + shuffle with partition-local
    * windows. No step ever sorts the corpus in a single partition, for
    * ANY score distribution — a per-row-unique score (timestamp, byte
    * length) degrades to a narrow extra materialization, not a
    * one-task sort. */
  def keepTopQuantile(df: DataFrame, score: Column, frac: Double,
      histPartitions: Int = 64): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "frac in (0, 1]")
    require(histPartitions > 0, "histPartitions must be positive")
    val s = score.cast("long")
    // ONE scoring pass builds the histogram, eagerly materialized: the
    // corpus count, the bucket boundaries, the per-bucket totals AND the
    // local cumsums all derive from it without touching the corpus
    // again (r17 — the r16 shape re-evaluated the score expression in
    // FOUR separate jobs: boundary probe, offsets collect, the window's
    // recompute, and the final filter; with text-feature scores each
    // pass re-ran the feature extraction, the measured 2× cost of
    // q_quality_keep). The checkpoint is distinct-score-values × 16 B —
    // for quantized integer scores a few rows per feature combination;
    // the per-row-unique worst case (timestamps) materializes two longs
    // per corpus row, orders of magnitude under the two corpus-wide
    // text-scoring passes it replaces.
    val hist0 = {
      val inner = df.select(s.as("__s"))
        .groupBy("__s").agg(count(lit(1)).as("__c"))
      graft.util.PlanProbe.record("quality-hist", inner) // r18 plan audit
      inner.localCheckpoint(true)
    }
    val probs = (1 until histPartitions)
      .map(i => lit(i.toDouble / histPartitions))
    // n over ALL rows (null scores included — they count toward the
    // corpus size exactly as df.count() did); boundaries are UNWEIGHTED
    // quantiles of the distinct scores — they only balance histogram
    // rows across the window partitions (which is precisely the load
    // the window carries), never the result. Duplicate split points
    // (heavy score mass) collapse — that mass is one histogram row.
    val (n, bounds) =
      if (probs.isEmpty)
        (hist0.agg(coalesce(sum(col("__c")), lit(0L))).first().getLong(0),
          Seq.empty[Long])
      else {
        val head = hist0.agg(
          coalesce(sum(col("__c")), lit(0L)).as("__n"),
          percentile_approx(col("__s"), array(probs: _*),
            lit(math.max(1000, 10 * histPartitions))).as("__b")).first()
        (head.getLong(0),
          Option(head.get(1)).map(_ => head.getSeq[Long](1).distinct
            .sorted(Ordering[Long].reverse)).getOrElse(Seq.empty))
      }
    if (n == 0L) return df.filter(lit(false))
    val target = math.ceil(frac * n).toLong
    // bucket 0 holds the highest scores; null scores fall past every
    // boundary into the last bucket (ordered after values, like DESC)
    val bucketOf: Column => Column = c => bounds.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, (b, i)) =>
        Some(acc.fold(when(c >= lit(b), lit(i)))(_.when(c >= lit(b), lit(i))))
      }.map(_.otherwise(lit(bounds.length))).getOrElse(lit(0))
    val hist = hist0.withColumn("__p", bucketOf(col("__s")))
    // two-level descending prefix sum: local cumsum per bucket + bucket
    // offsets. The per-bucket totals are ≤ histPartitions rows BY
    // CONSTRUCTION — collect them and compute the exclusive prefix sum
    // on the driver, re-entering as a literal frame: one evaluation of
    // the hist aggregate for the offsets (the r15 triangle join fed
    // hist to three consumers), no single-partition WindowExec, same
    // integer arithmetic
    val local = hist.withColumn("__lcum", sum(col("__c"))
      .over(Window.partitionBy(col("__p")).orderBy(col("__s").desc)))
    val ptots = hist.groupBy(col("__p")).agg(sum(col("__c")).as("__pt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix: offset of bucket i = Σ totals of buckets < i
    val excl = ptots.map(_._2).scanLeft(0L)(_ + _).init
    val offsets = {
      val sp = df.sparkSession
      import sp.implicits._
      ptots.map(_._1).zip(excl).toSeq.toDF("__p", "__off")
    }
    val thr = local.join(broadcast(offsets), Seq("__p"))
      .withColumn("__cum", col("__lcum") + col("__off"))
      .filter(col("__cum") >= lit(target))
      .agg(max(col("__s")).as("__thr"))
    df.crossJoin(broadcast(thr)).filter(s >= col("__thr")).drop("__thr")
  }

  /** Concat-and-chunk sequence packing (the standard LLM-pretraining
    * layout): documents are concatenated in (shard, id) order into one
    * token stream per shard, which is then chunked into fixed-`cap`
    * training sequences. Each document gets its token interval
    * [tok_start, tok_end) in the shard's stream and the range of sequence
    * ids it lands in — `seq_first`..`seq_last` (a document longer than
    * `cap` spans several sequences; a document whose interval straddles a
    * chunk boundary contributes its tail to the next sequence, exactly
    * like the real packing loop).
    *
    * All arithmetic is exact integer (window sum + integer division), so
    * the window-SQL oracle matches bit-for-bit. Zero-token documents get
    * the empty interval at their stream position (`seq_last = seq_first`,
    * `n_seqs = 1` — they "land" in the sequence open at that offset).
    */
  def packSequences(df: DataFrame, shard: Column, id: Column,
      nTokens: Column, cap: Long): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy("__shard").orderBy(col("__id").asc)
    df.withColumn("__shard", shard)
      .withColumn("__id", id)
      .withColumn("__n", nTokens.cast("long"))
      .withColumn("tok_end", sum(col("__n")).over(w))
      .withColumn("tok_start", col("tok_end") - col("__n"))
      .withColumn("seq_first", expr(s"tok_start div ${cap}L"))
      .withColumn("seq_last",
        when(col("__n") > 0, expr(s"(tok_end - 1) div ${cap}L"))
          .otherwise(col("seq_first")))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
      .drop("__shard", "__id", "__n")
  }

  /** ALL word `n`-grams of a text column as strings (space-joined
    * lower-cased whitespace tokens), in document order WITH repeats.
    * Documents with fewer than `n` tokens yield their whole token sequence
    * as one gram — same convention as the shingle oracles. */
  def wordGramsAll(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** Segment manifest of [[packSequences]]: ONE ROW PER (document,
    * training sequence) pair — for every sequence a document's token
    * interval touches, the offset inside that sequence where the
    * document's tokens land (`seg_start`) and how many land there
    * (`seg_len`). This is the table a training-data loader actually
    * consumes: group by (shard, seq) and you have each sequence's
    * composition; sum(seg_len) per sequence is exactly `cap` for every
    * sequence except each shard's last. Zero-token documents emit one
    * zero-length segment at their stream position.
    *
    * Same single shuffle as packSequences plus a per-row explode of the
    * (tiny) per-doc sequence span — no additional wide operation. */
  def packSegments(df: DataFrame, shard: Column, id: Column,
      nTokens: Column, cap: Long): DataFrame =
    packSequences(df, shard, id, nTokens, cap)
      .withColumn("seq", explode(sequence(col("seq_first"), col("seq_last"))))
      .withColumn("seg_start",
        greatest(col("tok_start"), col("seq") * cap) - col("seq") * cap)
      .withColumn("seg_len",
        least(col("tok_end"), (col("seq") + 1) * cap) -
          greatest(col("tok_start"), col("seq") * cap))
      .drop("seq_first", "seq_last", "n_seqs")

  /** Distinct word `n`-grams of a text column as strings. */
  def wordGrams(text: Column, n: Int): Column =
    array_distinct(wordGramsAll(text, n))

  /** Ids of training documents CONTAMINATED by the eval set: any shared
    * word `n`-gram with any eval document. Joining on the gram STRING
    * keeps the predicate exact (no hash-collision caveat); at corpus scale
    * the equality probe is a broadcast-hash lookup against the eval side's
    * distinct grams, so the corpus never shuffles. (If the eval side ever
    * outgrew broadcast, hashing both sides with xxhash64 before the join
    * shrinks the shuffle — candidate generation only; re-verify on
    * strings.) */
  def contaminatedIds(train: DataFrame, id: Column, text: Column,
      evalDf: DataFrame, evalText: Column, n: Int): DataFrame = {
    // explode_outer: see the explode note in Dedup — plain explode makes
    // Catalyst infer a size()>0 filter that re-evaluates the gram
    // expression below the widening exchange.
    val evalGrams = evalDf
      .select(explode_outer(wordGrams(evalText, n)).as("__g"))
      .distinct()
    train
      .select(id.cast("long").as("__cid"),
        explode_outer(wordGrams(text, n)).as("__g"))
      .join(broadcast(evalGrams), "__g")
      .select(col("__cid"))
      .distinct()
  }

  /** Training rows with every document that shares an `n`-gram with the
    * eval set removed — benchmark decontamination as one anti-join. */
  def decontaminate(train: DataFrame, id: Column, text: Column,
      evalDf: DataFrame, evalText: Column, n: Int): DataFrame =
    train.join(contaminatedIds(train, id, text, evalDf, evalText, n),
      id.cast("long") === col("__cid"), "left_anti")

  /** Corpus-level BOILERPLATE score (the RefinedWeb/CCNet-style signal):
    * per document, the per-mille of its `n`-gram OCCURRENCES that are
    * corpus-frequent — appearing in at least `minDfPermille`‰ of all
    * documents. Headers, navigation chrome, and license blurbs repeat
    * across a crawl; a high score marks a document that is mostly such
    * furniture.
    *
    * Shape at scale: document frequency is ONE shuffle of the
    * distinct-gram stream; the "hot" set is tiny BY CONSTRUCTION (grams
    * in ≥ minDfPermille‰ of documents — the threshold bounds it at
    * 1000/minDfPermille × the mean distinct grams per doc) so it
    * broadcasts; the hot-occurrence count shuffles only the hot rows of
    * the gram stream; and the final per-doc join is id-keyed. The corpus
    * text itself is read once. Thresholding is RELATIVE (per-mille of the
    * corpus doc count, computed in-plan) so the semantics are
    * scale-invariant.
    *
    * Returns (id, n_grams, boilerplate_permille) — integer-exact, so the
    * SQL oracle hash-matches. */
  def boilerplateScore(df: DataFrame, id: Column, text: Column,
      n: Int = 2, minDfPermille: Int = 80): DataFrame = {
    val ga = df.select(id.cast("long").as("id"),
      wordGramsAll(text, n).as("__gs"))
    // explode_outer: see the explode note in Dedup.
    val occ = ga.select(col("id"), explode_outer(col("__gs")).as("__g"))
    val docFreq = ga
      .select(explode_outer(array_distinct(col("__gs"))).as("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__df"))
    val total = ga.agg(count(lit(1)).as("__total"))
    val hot = docFreq.crossJoin(broadcast(total))
      .filter(col("__df") * 1000 >= col("__total") * minDfPermille)
      .select("__g")
    val hotCounts = occ.join(broadcast(hot), "__g")
      .groupBy("id").agg(count(lit(1)).as("__h"))
    ga.select(col("id"), size(col("__gs")).cast("long").as("n_grams"))
      .join(hotCounts, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        floor(coalesce(col("__h"), lit(0L)) * lit(1000) / col("n_grams"))
          .cast("long").as("boilerplate_permille"))
  }

  /** Per-document SALIENT TERMS — the tf-idf shape in integer-exact form:
    * each doc's top-`k` tokens ranked by salience_ppm =
    * floor(tf · 10⁶ / df), term frequency in the doc over document
    * frequency in the corpus (rare-everywhere-but-frequent-here wins, the
    * tf-idf ordering rationale with the log dropped so every value is a
    * deterministic integer — no libm/rounding drift between engines).
    *
    * Plan shape at 100 TB: ONE pass over the text — explode to a token
    * stream, map-side-combined groupBy (id, token) for tf; df aggregates
    * the ALREADY-REDUCED tf rows (distinct (doc, token) pairs), never the
    * raw stream; the tf⋈df join is token-keyed (AQE broadcasts the
    * vocabulary side when it fits); the top-k window shuffles by doc id
    * once. Ties break by token asc, so ranks are deterministic.
    *
    * Returns (id, token, tf, df, salience_ppm, rnk ≤ k). */
  def salientTerms(df: DataFrame, id: Column, text: Column,
      k: Int = 5): DataFrame = {
    val toks = df.select(id.cast("long").as("id"),
        explode(TextAnalysis.tokens(text)).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("salience_ppm").desc, col("token").asc)
    tf.join(dfreq, "token")
      .withColumn("salience_ppm",
        floor(col("tf") * lit(1000000L) / col("df")).cast("long"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("id"), col("token"), col("tf"), col("df"),
        col("salience_ppm"), col("rnk"))
  }
}
