package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata travelling with an opaque media payload. */
final case class MediaMeta(kind: String, width: Int, height: Int,
    durationMs: Long)

/** One media object: opaque bytes + typed metadata. At 100 TB the `content`
  * column stays in parquet as `binary` and is only materialized inside the
  * partition that processes it — never collected, never shuffled wider than
  * its repartition target. */
final case class MediaRecord(media_id: Long, meta: MediaMeta,
    content: Array[Byte])

/** Extracted per-media feature vector. */
final case class MediaFeatures(media_id: Long, kind: String, nBytes: Long,
    features: Array[Float])

/** A sampled video frame (decode-stubbed). */
final case class MediaFrame(media_id: Long, frameIdx: Int, tsMs: Long,
    content: Array[Byte])

/** Multimodal-column operators: treat image/audio/video as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run batch-wise per partition (`mapPartitions` over typed
  * Datasets — the Scala analog of `mapInPandas` batches).
  *
  * ==== STUB NOTICE ====
  * The image/audio codecs are NOT in this container, so the byte-decoding
  * kernels below are deterministic fakes (hash-derived features, truncated
  * "resized" payloads, synthesized frame bytes) clearly marked [STUB].
  * The Spark-side plumbing — schemas, encoders, partitioning, batch shape,
  * lazy iterator processing — is real and tested; swapping a real codec in
  * means replacing only the marked functions.
  */
object Multimodal {

  /** Lift a raw DataFrame (id, kind, width, height, duration_ms, content)
    * into the typed Dataset. */
  def fromBinary(df: DataFrame): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col("media_id").cast("long"),
      struct(col("kind").as("kind"),
        col("width").cast("int").as("width"),
        col("height").cast("int").as("height"),
        col("duration_ms").cast("long").as("durationMs")).as("meta"),
      col("content").cast("binary")).as[MediaRecord]
  }

  /** [STUB decode] Deterministic fake feature vector: chunk the payload and
    * fold each chunk's bytes into a float in [-1, 1]. A real implementation
    * would decode the image/audio and run a feature extractor here; the
    * iterator-in/iterator-out partition shape (no per-row task setup,
    * streaming through the partition without materializing it) is the part
    * that matters at scale and is real. */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 16)
      : Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val bytes = r.content
        val features = Array.tabulate(dim) { i =>
          // [STUB] hash-fold of the i-th stripe of bytes
          var acc = 1125899906842597L + i
          var j = i
          while (j < bytes.length) { acc = 31 * acc + bytes(j); j += dim }
          (math.floorMod(acc, 2000001L) / 1000000.0f) - 1.0f
        }
        MediaFeatures(r.media_id, r.meta.kind, bytes.length.toLong, features)
      }
    }
  }

  /** [STUB resize] Pretend-resize an image payload: updates the typed
    * metadata and deterministically truncates bytes proportionally to the
    * pixel reduction. Real codec drop-in replaces the byte math only. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val oldPx = math.max(r.meta.width * r.meta.height, 1)
        val ratio = math.min(1.0, (w.toDouble * h) / oldPx)
        val n = math.max(1, (r.content.length * ratio).toInt)
        r.copy(meta = r.meta.copy(width = w, height = h),
          content = r.content.take(n))
      }
    }
  }

  /** [STUB frame-sample] One frame every `everyMs` for video records; frame
    * bytes are a deterministic slice of the source payload. flatMap shape:
    * output cardinality = Σ duration/everyMs, computed streaming. */
  def sampleFrames(ds: Dataset[MediaRecord], everyMs: Long)
      : Dataset[MediaFrame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.meta.kind == "video").flatMap { r =>
      val nFrames = math.max(1, (r.meta.durationMs / everyMs).toInt)
      (0 until nFrames).iterator.map { i =>
        val start = if (r.content.isEmpty) 0
          else (i * r.content.length / nFrames)
        MediaFrame(r.media_id, i, i * everyMs,
          r.content.slice(start, math.min(start + 64, r.content.length)))
      }
    }
  }

  /** Metadata-only stats over a media table: per-kind count/bytes — pure
    * built-ins, no decode, oracle-expressible in SQL. avg is the explicit
    * floor(sum/count) (both < 2⁵³, so the double division is exact and
    * engine-portable — `avg()` aggregates are not, and DuckDB's sum(BIGINT)
    * is a HUGEINT that needs re-casting on the oracle side). */
  def stats(df: DataFrame): DataFrame =
    df.groupBy("kind").agg(
        count(lit(1)).as("n"),
        sum(length(col("content")).cast("long")).as("total_bytes"))
      .withColumn("avg_bytes",
        floor(col("total_bytes").cast("double") / col("n")).cast("long"))
}
