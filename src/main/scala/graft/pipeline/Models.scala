package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-model fitting for quality classification — the
  * fastText/CCNet-style "train a cheap linear scorer on document features,
  * score the whole corpus" step of a training-data pipeline (Wenzek et al.
  * 2020 train a classifier to rank documents; the linear-on-features form
  * here is the sufficient-statistics-friendly variant).
  *
  * Scale design (100 TB): ridge regression has a CLOSED FORM in the
  * (p+1)×(p+1) moment matrices — one aggregation job computes XᵀX and Xᵀy
  * over the augmented feature vector [1, f₁…f_p] via
  * [[graft.functions.OuterSumAgg]] (zero per-row allocation, map-side
  * combined: the driver sees a single p² row regardless of corpus size),
  * and the p×p solve runs on the driver via breeze. No SGD, no iterations,
  * no parameter shuffling — the same shape as [[Similarity.pcaTrain]].
  *
  * Scoring is INTEGER-EXACT by construction: weights are quantized ONCE on
  * the driver (round(w·qscale) → BIGINT literals), so a score over integer
  * features is a pure BIGINT dot product — bit-identical in any engine and
  * therefore hash-gatable, with no fp-summation-order caveat. The fp
  * `weights` stay available for callers that want real-valued scores.
  */
object Models {

  /** Fitted linear model. `weights(0)` is the intercept; `qweights` are
    * `round(weights · qscale)` — the integer-exact scoring table. */
  case class LinearModel(weights: Seq[Double], qscale: Long,
      qweights: Seq[Long])

  /** Ridge regression via normal equations: `w = (XᵀX + λ·n·I′)⁻¹ Xᵀy`
    * with the intercept unpenalized (I′ zeroes the [0,0] entry). One
    * distributed job; rows with a null label or with ANY null feature
    * value are skipped (the explicit `exists`-null filter below — a null
    * feature becomes a null ELEMENT of the assembled `array()` vector,
    * which the moment aggregate would otherwise reject loudly, never a
    * silently-absorbed whole-null row).
    *
    * The moment sums are floating-point and follow partition merge order,
    * so the last ulp of `weights` can differ between runs — consumers
    * that need replay (the oracle gates) embed the QUANTIZED weights of
    * the run that trained, exactly like the trained-BPE gate embeds its
    * learned merge table. */
  def ridgeFit(df: DataFrame, features: Seq[Column], label: Column,
      lambda: Double = 1e-3, qscale: Long = 1000000L): LinearModel = {
    require(features.nonEmpty, "at least one feature column")
    require(qscale > 0, "qscale must be positive")
    val p = features.size + 1
    val z = array((lit(1.0d) +: features.map(_.cast("double"))): _*)
    val row = df.select(z.as("z"), label.cast("double").as("y"))
      .filter(col("y").isNotNull && !exists(col("z"), _.isNull))
      .agg(count(lit(1)).as("n"),
        graft.functions.OuterSumAgg.outerSum(col("z"), col("z"), p, p)
          .as("xtx"),
        graft.functions.OuterSumAgg.outerSum(col("z"), array(col("y")),
          p, 1).as("xty"))
      .head()
    val n = row.getLong(0)
    require(n > 0, "ridgeFit: empty (or fully-null-label) training set")
    val xtx = row.getSeq[Double](1)
    val xty = row.getSeq[Double](2)
    val a = breeze.linalg.DenseMatrix.tabulate[Double](p, p) { (i, j) =>
      xtx(i * p + j) + (if (i == j && i > 0) lambda * n else 0.0)
    }
    val b = breeze.linalg.DenseVector(xty.toArray)
    val w = (a \ b).toArray.toSeq
    LinearModel(w, qscale, w.map(x => math.round(x * qscale)))
  }

  /** Real-valued score `w₀ + Σ wᵢ·fᵢ` (double). */
  def score(model: LinearModel, features: Seq[Column]): Column = {
    require(features.size + 1 == model.weights.size,
      s"model has ${model.weights.size - 1} features, got ${features.size}")
    features.zip(model.weights.tail)
      .map { case (f, w) => f.cast("double") * lit(w) }
      .foldLeft(lit(model.weights.head): Column)(_ + _)
  }

  /** Integer-exact quantized score `qw₀ + Σ qwᵢ·fᵢ` (BIGINT) — features
    * must be integer-typed; ≈ `score · qscale`. Pure integer arithmetic:
    * identical in every engine, safe under a hash gate. */
  def scoreQ(model: LinearModel, features: Seq[Column]): Column = {
    require(features.size + 1 == model.qweights.size,
      s"model has ${model.qweights.size - 1} features, got ${features.size}")
    features.zip(model.qweights.tail)
      .map { case (f, w) => f.cast("long") * lit(w) }
      .foldLeft(lit(model.qweights.head): Column)(_ + _)
  }

  /** Logistic regression via IRLS (iteratively reweighted least
    * squares): each iteration is ONE moment job — XᵀWX = Σ (√s·z)(√s·z)ᵀ
    * via [[graft.functions.OuterSumAgg]] and XᵀW·u = Σ z·(s·η + y − μ)
    * (the working response folded in-plan), then a p×p driver solve —
    * so the whole fit is `iters` embarrassingly-parallel passes with a
    * p²-sized driver exchange each, no SGD, no parameter shuffling.
    * μ = σ(η), s = μ(1−μ) floored at 1e-6 (the standard IRLS guard for
    * separated points). `lambda·n` ridge on the non-intercept weights
    * keeps separable data finite. Labels must be in {0, 1}.
    *
    * COST: the fit is `iters` FULL passes over the training corpus (the
    * projected base frame is persisted, but every iteration re-reads it
    * to fold the current weights into η) — at 100 TB keep `iters`
    * single-digit; IRLS converges quadratically, so 4–8 iterations is
    * the working range, not a budget cut. Null handling and the
    * determinism contract match [[ridgeFit]]: rows with a null label or
    * any null feature are skipped; fp moment sums follow merge order;
    * oracle gates embed the run's quantized weights. */
  def logisticFit(df: DataFrame, features: Seq[Column], label: Column,
      lambda: Double = 1e-6, iters: Int = 8,
      qscale: Long = 1000000L): LinearModel = {
    require(features.nonEmpty, "at least one feature column")
    require(iters >= 1, "at least one IRLS iteration")
    val p = features.size + 1
    val z = array((lit(1.0d) +: features.map(_.cast("double"))): _*)
    val base = df.select(z.as("z"), label.cast("double").as("y"))
      .filter(col("y").isNotNull && !exists(col("z"), _.isNull))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      require(n > 0, "logisticFit: empty (or fully-null-label) training set")
      var w: Seq[Double] = Seq.fill(p)(0.0)
      for (_ <- 0 until iters) {
        val eta = aggregate(zip_with(col("z"), typedLit(w),
          (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)
        val it = base.select(col("z"), col("y"), eta.as("eta"))
          .withColumn("mu",
            lit(1.0d) / (lit(1.0d) + exp(-col("eta"))))
          .withColumn("s",
            greatest(col("mu") * (lit(1.0d) - col("mu")), lit(1e-6d)))
          .withColumn("a", transform(col("z"), zi => zi * sqrt(col("s"))))
          .withColumn("b", transform(col("z"),
            zi => zi * (col("s") * col("eta") + col("y") - col("mu"))))
          .agg(graft.functions.OuterSumAgg.outerSum(col("a"), col("a"),
              p, p).as("xwx"),
            graft.functions.OuterSumAgg.outerSum(col("b"),
              array(lit(1.0d)), p, 1).as("xwu"))
          .head()
        val xwx = it.getSeq[Double](0)
        val xwu = it.getSeq[Double](1)
        val a = breeze.linalg.DenseMatrix.tabulate[Double](p, p) {
          (i, j) =>
            xwx(i * p + j) + (if (i == j && i > 0) lambda * n else 0.0)
        }
        val b = breeze.linalg.DenseVector(xwu.toArray)
        w = (a \ b).toArray.toSeq
      }
      LinearModel(w, qscale, w.map(x => math.round(x * qscale)))
    } finally base.unpersist()
  }

  /** A model re-loaded from a [[save]] sidecar: the frozen weights plus
    * the feature EXPRESSIONS (SQL strings) they were fitted on, so a
    * later session can re-score any table from the directory alone. */
  case class PersistedModel(kind: String, features: Seq[String],
      model: LinearModel)

  /** The features' SQL renderings — what [[save]] persists so the scoring
    * expressions travel with the weights (Catalyst's `Expression.sql`
    * round-trips through `expr()` for the projection/function trees these
    * models use; spec-pinned in ModelsSpec). */
  def featureSql(features: Seq[Column]): Seq[String] =
    features.map(org.apache.spark.sql.graft.Bridge.columnSql)

  /** Persist a fitted model as a SELF-DESCRIBING metadata sidecar: ONE
    * parquet row (kind, feature SQL strings, fp weights, qscale,
    * quantized weights) under `dir`. The cross-session CCNet serving
    * shape: fit once on a curated table, then [[load]] + [[scoreQ]] any
    * corpus with the FROZEN integer weights — no refit, no training-data
    * read, and the quantized scores stay bit-identical to the fitting
    * run's. */
  def save(spark: org.apache.spark.sql.SparkSession, dir: String,
      kind: String, features: Seq[String], model: LinearModel): Unit = {
    import spark.implicits._
    Seq((kind, features, model.weights, model.qscale, model.qweights))
      .toDF("kind", "features", "weights", "qscale", "qweights")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[save]] sidecar. */
  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): PersistedModel = {
    val r = spark.read.parquet(dir).head()
    PersistedModel(r.getString(0), r.getSeq[String](1).toList,
      LinearModel(r.getSeq[Double](2).toList, r.getLong(3),
        r.getSeq[Long](4).toList))
  }

  /** Corpus-trained models cached per (kind, source key) — one fit per
    * table per JVM; [[lastTrained]] exposes the most recent result PER
    * KIND so the oracle-SQL generators — `def`s rendered AFTER the
    * queries run in `graft.Verify` — can embed the SAME quantized
    * weights each query scored with (the trained-BPE embedding
    * mechanism), even when both model kinds run in one Verify pass. */
  private val trainedCache =
    new java.util.concurrent.ConcurrentHashMap[String, LinearModel]()
  @volatile private var lastKeys: Map[String, String] = Map.empty

  private def cached(kind: String, key: String)(
      fit: => LinearModel): LinearModel = {
    val full = s"$kind:$key"
    val m = trainedCache.computeIfAbsent(full, _ => fit)
    synchronized { lastKeys = lastKeys.updated(kind, full) }
    m
  }

  def trainedFor(df: => DataFrame, features: => Seq[Column],
      label: => Column, key: String, lambda: Double = 1e-3): LinearModel =
    cached("ridge", key)(ridgeFit(df, features, label, lambda))

  /** [[trainedFor]] under a caller-chosen kind — lets a query family
    * (e.g. the frozen-sidecar gate, fitted on a different slice) keep
    * its own [[lastTrained]] slot without clobbering the plain ridge
    * one. */
  def ridgeTrainedForKind(kind: String, df: => DataFrame,
      features: => Seq[Column], label: => Column, key: String,
      lambda: Double = 1e-3): LinearModel =
    cached(kind, key)(ridgeFit(df, features, label, lambda))

  def logisticTrainedFor(df: => DataFrame, features: => Seq[Column],
      label: => Column, key: String, lambda: Double = 1e-6,
      iters: Int = 8): LinearModel =
    cached("logit", key)(logisticFit(df, features, label, lambda, iters))

  /** The most recently trained model of `kind` ("ridge" | "logit"). */
  def lastTrained(kind: String): Option[LinearModel] =
    lastKeys.get(kind).flatMap(k => Option(trainedCache.get(k)))

  /** The most recent ridge model (back-compat accessor). */
  def lastTrained: Option[LinearModel] = lastTrained("ridge")
}
