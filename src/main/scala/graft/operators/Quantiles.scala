package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles by iterative histogram refinement — no
  * global sort, no per-group value buffering.
  *
  * Rank contract (matches DuckDB's `quantile_disc`): the p-quantile of n
  * non-null rows is the k-th smallest value (1-based, duplicates counted)
  * with k = max(1, ceil(p·n)).
  *
  * Why not the obvious alternatives at 100 TB:
  *  - `ORDER BY` + take(k): a full range-shuffle sort of every row.
  *  - Spark's exact `percentile` aggregate: buffers a count-map of every
  *    DISTINCT value per group — OOMs on high-cardinality columns.
  *  - `approx_percentile`: bounded memory, but approximate.
  *
  * This operator: one stats pass (n, min, max), then per requested prob a
  * bracket [lo, hi] is narrowed by one B-bucket histogram per round — a
  * map-side-combined aggregate whose shuffle is ≤ B rows — until the
  * bracket holds ≤ `maxExact` rows; those aggregate per DISTINCT value and
  * the exact rank is picked on the driver. Rounds ≈ ⌈log_B(n/maxExact)⌉:
  * n = 10¹², B = 1024, maxExact = 10⁵ → 3 counting rounds, each
  * metadata-sized.
  *
  * fp-edge honesty: the `floor((v−lo)/width·B)` bucket index and
  * arithmetic bounds like `lo + width·i/B` are DIFFERENT fp expressions
  * and can disagree by an ulp at bucket edges — so the next bracket is
  * never an arithmetic bound. Instead the histogram reports each
  * bucket's actual (count, min vd, max vd); the bucket index is MONOTONE
  * in vd (equal doubles always share a bucket), so buckets are
  * contiguous runs of the sorted values and the rows with
  * vd ∈ [bucket min, bucket max] are EXACTLY that bucket's rows — the
  * data-derived bounds are an exact sub-bracket with nothing to
  * re-verify. Brackets live on the order-monotone double cast; the final
  * selection compares ORIGINAL values, so the result is exact for any
  * ordered numeric type regardless of double rounding. */
object Quantiles {

  /** One row per requested probability: (p_permille, value), where value
    * is the exact discrete quantile of `value` over `df`'s non-null rows,
    * in the column's own type. Empty input → empty result. */
  def exactQuantiles(df: DataFrame, value: Column, probs: Seq[Double],
      buckets: Int = 1024, maxExact: Int = 100000): DataFrame = {
    require(probs.nonEmpty, "at least one probability required")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0, 1]: $probs")
    require(buckets >= 2, s"need >= 2 histogram buckets (got $buckets)")
    val spark = df.sparkSession
    // Every refinement round re-scans the projected column — persist the
    // single-column frame for the call (memory-and-disk: at 100 TB the
    // one column is the working set, and spilled blocks still beat
    // re-reading the table per round).
    val base = graft.util.ParallelScan.widen(df.select(value.as("__v")))
      .filter(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val valueType = base.schema("__v").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p_permille",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("value", valueType)))

    val stats = base.agg(count(lit(1)).as("n"),
      min(col("__v").cast("double")).as("lo"),
      max(col("__v").cast("double")).as("hi")).collect()(0)
    val n = stats.getLong(0)
    if (n == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val (gLo, gHi) = (stats.getDouble(1), stats.getDouble(2))
    val vd = col("__v").cast("double")
    // Every prob's FIRST round histograms the identical global bracket —
    // memoize per bracket so requesting many probs costs one shared
    // first-round pass plus only the divergent refinements. Each bucket
    // reports (count, min vd, max vd): floor((vd−lo)/width·B) is MONOTONE
    // in vd, so buckets are CONTIGUOUS runs of the sorted values — the
    // rows with vd ∈ [bucket min, bucket max] are exactly that bucket's
    // rows (equal doubles always share a bucket), making the data-derived
    // bounds an EXACT sub-bracket with no fp edge to re-verify.
    val histoCache = new java.util.concurrent.ConcurrentHashMap[
      (Double, Double), Seq[(Int, Long, Double, Double)]]()
    def histogram(lo: Double, hi: Double,
        width: Double): Seq[(Int, Long, Double, Double)] =
      histoCache.computeIfAbsent((lo, hi), { _ =>
        val idx = least(
          floor((vd - lit(lo)) / lit(width) * lit(buckets)).cast("int"),
          lit(buckets - 1))
        base.filter(vd >= lit(lo) && vd <= lit(hi))
          .groupBy(idx.as("__b")).agg(count(lit(1)).as("c"),
            min(vd).as("mn"), max(vd).as("mx"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
            r.getDouble(3)))
          .sortBy(_._1).toSeq
      })

    def answerFor(p: Double): Any = {
      var rank = math.max(1L, math.ceil(p * n).toLong)
      var lo = gLo
      var hi = gHi
      var cnt = n
      var progress = true
      while (cnt > maxExact && lo < hi && progress) {
        val width = hi - lo
        val histo = histogram(lo, hi, width)
        // walk buckets in vd order to the one containing the target rank
        var cum = 0L
        var i = 0
        while (i < histo.size - 1 && cum + histo(i)._2 < rank) {
          cum += histo(i)._2; i += 1
        }
        val (_, bCnt, bMin, bMax) = histo(i)
        progress = bMin > lo || bMax < hi
        rank -= cum
        cnt = bCnt
        lo = bMin
        hi = bMax
      }
      // Exact stage: aggregate per DISTINCT original value inside the
      // bracket (collect is bounded by distinct values ≤ cnt ≤ maxExact;
      // a tie-dominated no-progress bracket is ulp-wide, so its distinct
      // count is tiny even when its row count is not) and walk to the
      // rank-th smallest in original-type order.
      val grouped = base.filter(vd >= lit(lo) && vd <= lit(hi))
        .groupBy(col("__v")).agg(count(lit(1)).as("c"))
        .orderBy(col("__v").asc)
        .collect()
      var cum = 0L
      var ans: Any = null
      var j = 0
      while (ans == null && j < grouped.length) {
        cum += grouped(j).getLong(1)
        if (cum >= rank) ans = grouped(j).get(0)
        j += 1
      }
      require(ans != null,
        s"internal: rank $rank not found in bracket [$lo, $hi]")
      ans
    }

    // Prime the shared first round once, then refine every prob
    // CONCURRENTLY — the scheduler interleaves the per-prob chains, so the
    // wall clock is one chain's latency, not the sum (the jobs are
    // metadata-sized; there is no contention to speak of).
    if (n > maxExact && gLo < gHi) histogram(gLo, gHi, gHi - gLo)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val answers = Await.result(
      Future.sequence(probs.map(p => Future((p, answerFor(p))))),
      Duration.Inf)
    val rows = answers.map { case (p, a) =>
      org.apache.spark.sql.Row(math.round(p * 1000).toInt, a)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    } finally base.unpersist()
  }

  /** Per-GROUP exact quantiles — the same rank contract and
    * histogram-refinement shape as [[exactQuantiles]], with EVERY
    * (group, prob) bracket advanced together: each round is ONE
    * aggregate job keyed (group, prob, bucket) over a broadcast table of
    * the active brackets, so the pass count is the DEEPEST group's
    * ⌈log_B(rows/maxExact)⌉ — never the group count. Driver state is
    * O(groups × probs), which per-group quantile semantics require
    * anyway (one answer row per group × prob). The same monotonicity
    * argument applies per bracket: each bucket reports its actual
    * (count, min vd, max vd) and those data-derived bounds are an exact
    * sub-bracket. Output: (grp, p_permille, value) in the group and
    * value columns' own types. */
  def exactQuantilesBy(df: DataFrame, group: Column, value: Column,
      probs: Seq[Double], buckets: Int = 1024,
      maxExact: Int = 100000): DataFrame = {
    require(probs.nonEmpty, "at least one probability required")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0, 1]: $probs")
    require(buckets >= 2, s"need >= 2 histogram buckets (got $buckets)")
    val spark = df.sparkSession
    val base = graft.util.ParallelScan.widen(
        df.select(group.as("__g"), value.as("__v")))
      .filter(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val grpType = base.schema("__g").dataType
    val valueType = base.schema("__v").dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp", grpType),
      org.apache.spark.sql.types.StructField("p_permille",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("value", valueType)))
    val vd = col("__v").cast("double")

    final case class St(grp: Any, pi: Int, var rank: Long, var lo: Double,
      var hi: Double, var cnt: Long, var stuck: Boolean = false,
      var ans: Any = null)
    val stats = base.groupBy(col("__g")).agg(count(lit(1)).as("n"),
      min(vd).as("lo"), max(vd).as("hi")).collect()
    val states = stats.flatMap { r =>
      val n = r.getLong(1)
      probs.zipWithIndex.map { case (p, pi) =>
        St(r.get(0), pi, math.max(1L, math.ceil(p * n).toLong),
          r.getDouble(2), r.getDouble(3), n)
      }
    }.toSeq
    def needsRound(s: St) = s.cnt > maxExact && s.lo < s.hi && !s.stuck
    val bracketSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__bg", grpType),
      org.apache.spark.sql.types.StructField("__pi",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__lo",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("__hi",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    def bracketsDf(ss: Seq[St]) = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(ss.map(s =>
        org.apache.spark.sql.Row(s.grp, s.pi, s.lo, s.hi)), 1),
      bracketSchema))
    def joined(ss: Seq[St]) = base.join(bracketsDf(ss),
      col("__g") <=> col("__bg") && vd >= col("__lo") && vd <= col("__hi"))

    while (states.exists(needsRound)) {
      val active = states.filter(needsRound)
      val idx = least(
        floor((vd - col("__lo")) / (col("__hi") - col("__lo")) *
          lit(buckets)).cast("int"), lit(buckets - 1))
      val histo = joined(active)
        .groupBy(col("__g").as("g"), col("__pi"), idx.as("__b"))
        .agg(count(lit(1)).as("c"), min(vd).as("mn"), max(vd).as("mx"))
        .collect()
        .groupBy(r => (r.get(0), r.getInt(1)))
        .map { case (k, rs) =>
          k -> rs.map(r => (r.getInt(2), r.getLong(3), r.getDouble(4),
            r.getDouble(5))).sortBy(_._1).toSeq
        }
      active.foreach { s =>
        val hs = histo((s.grp, s.pi))
        var cum = 0L
        var i = 0
        while (i < hs.size - 1 && cum + hs(i)._2 < s.rank) {
          cum += hs(i)._2; i += 1
        }
        val (_, bCnt, bMin, bMax) = hs(i)
        s.stuck = !(bMin > s.lo || bMax < s.hi)
        s.rank -= cum
        s.cnt = bCnt
        s.lo = bMin
        s.hi = bMax
      }
    }
    // Exact stage, ALL remaining states in one job: per-distinct-value
    // counts inside each final bracket, resolved engine-ordered.
    val grouped = joined(states)
      .groupBy(col("__g").as("g"), col("__pi"), col("__v"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("__pi"), col("__v").asc)
      .collect()
      .groupBy(r => (r.get(0), r.getInt(1)))
    states.foreach { s =>
      val vs = grouped((s.grp, s.pi))
      var cum = 0L
      var j = 0
      while (s.ans == null && j < vs.length) {
        cum += vs(j).getLong(3)
        if (cum >= s.rank) s.ans = vs(j).get(2)
        j += 1
      }
      require(s.ans != null,
        s"internal: group ${s.grp} rank ${s.rank} not found in bracket " +
          s"[${s.lo}, ${s.hi}]")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(states.map(s =>
        org.apache.spark.sql.Row(s.grp,
          math.round(probs(s.pi) * 1000).toInt, s.ans)), 1),
      outSchema)
    } finally base.unpersist()
  }
}
