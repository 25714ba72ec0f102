package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

/** Decoded image facts (REAL codec path — see [[Multimodal.decodeImageDims]]).
  * px_sum is the integer sum of band-0 raster samples — a deterministic
  * whole-raster checksum proving the pixels were actually decoded. */
final case class ImageDims(media_id: Long, width: Long, height: Long,
    px_sum: Long)

/** Decoded audio facts (REAL codec path — see
  * [[Multimodal.decodeAudioFacts]]). amp_sum is the signed sum of all PCM
  * samples — a deterministic whole-waveform checksum. */
final case class AudioFacts(media_id: Long, sample_rate: Long,
    n_samples: Long, amp_sum: Long)

/** Multimodal-column operators: treat image/audio/video as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run batch-wise per partition (`mapPartitions` over typed
  * Datasets — the Scala analog of `mapInPandas` batches).
  *
  * ==== Codec status ====
  * IMAGE encode/decode is REAL: the JDK ships PNG/JPEG/BMP/GIF codecs in
  * `javax.imageio` — [[encodePng]]/[[decodeImageDims]] run actual
  * compression round-trips (exercised oracle-backed by q_image_dims).
  * AUDIO encode/decode is REAL for PCM WAV/AIFF/AU: the JDK ships them in
  * `javax.sound.sampled` — [[encodeWav]]/[[decodeAudioFacts]] run actual
  * container round-trips (oracle-backed by q_audio_stats).
  * IMAGE resize and IMAGE feature extraction are REAL too
  * ([[resizeImages]]: decode → Graphics2D bilinear rescale → re-encode;
  * [[imageHistogramFeatures]]: decoded-intensity histogram vectors).
  * VIDEO codecs are NOT in this container, so the generic feature-extract /
  * generic-resize / frame-sample kernels below remain deterministic fakes
  * clearly marked [STUB]; their Spark-side plumbing — schemas, encoders,
  * partitioning, batch shape, lazy iterator processing — is real and
  * tested, and swapping a real codec in means replacing only the marked
  * functions.
  */
object Multimodal {

  /** ImageIO defaults to FILE-backed stream caches (a temp file created and
    * deleted per encode/decode — syscall-bound and serialized on /tmp);
    * in-memory caches are strictly better for our byte-array round trips.
    * JVM-wide, executor-side: set lazily from within the codec kernels. */
  @transient private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

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
    * pixel reduction. Real codec drop-in replaces the byte math only —
    * see [[resizeImages]] for the REAL image path. */
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

  /** REAL codec: decode → bilinear-rescale (Graphics2D) → re-encode PNG.
    * Pure JDK. Undecodable payloads pass through unchanged (metadata
    * untouched) so mixed media batches survive; decoded ones carry the new
    * dimensions in bytes AND typed metadata. */
  def resizeImages(ds: Dataset[MediaRecord], w: Int, h: Int)
      : Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      imageIoMemCache
      it.map { r =>
        Option(r.content)
          .flatMap(b => Option(
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))))
          .map { img =>
            val out = new java.awt.image.BufferedImage(w, h, img.getType match {
              case 0 => java.awt.image.BufferedImage.TYPE_INT_RGB
              case t => t
            })
            val g = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            r.copy(meta = r.meta.copy(width = w, height = h),
              content = bos.toByteArray)
          }
          .getOrElse(r)
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

  /** REAL feature extraction for IMAGES: decode the payload (ImageIO) and
    * emit the L1-normalized band-0 intensity histogram as the feature
    * vector — an actual decoded-pixel feature, not a byte hash. Undecodable
    * payloads are dropped. Same iterator-per-partition shape as the stub
    * kernels; compose with [[Similarity]] for visual near-dup search. */
  def imageHistogramFeatures(df: DataFrame, id: Column, content: Column,
      bins: Int = 16): Dataset[MediaFeatures] = {
    require(bins >= 1 && 256 % bins == 0, "bins must divide 256")
    val spark = df.sparkSession
    import spark.implicits._
    val width = 256 / bins
    df.select(id.cast("long").as("media_id"), content.cast("binary").as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoMemCache
        it.flatMap { case (mid, bytes) =>
          Option(bytes)
            .flatMap(b => Option(
              javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))))
            .map { img =>
              val raster = img.getRaster
              val hist = new Array[Long](bins)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  hist((raster.getSample(x, y, 0) & 0xFF) / width) += 1
                  x += 1
                }
                y += 1
              }
              val n = math.max(img.getWidth.toLong * img.getHeight, 1L)
              MediaFeatures(mid, "image", bytes.length.toLong,
                hist.map(c => c.toFloat / n))
            }
        }
      }
  }

  /** REAL codec: encode a deterministic grayscale image as PNG via the
    * JDK's ImageIO (`pixel(x, y)` supplies band-0 samples, masked to 8
    * bits). Runs inside executors — no driver-side image handling. */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    imageIoMemCache
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixel(x, y) & 0xFF); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL codec: decode image payloads (PNG/JPEG/BMP/GIF via ImageIO) into
    * (width, height, band-0 raster sum). Iterator-in/iterator-out partition
    * shape: one codec instance per task, payloads materialized one at a
    * time, never collected or shuffled undecoded. Null/undecodable payloads
    * are dropped (flatMap), mirroring SQL null-dropping semantics. */
  def decodeImageDims(df: DataFrame, id: Column, content: Column)
      : Dataset[ImageDims] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), content.cast("binary").as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoMemCache
        it.flatMap { case (mid, bytes) =>
          Option(bytes)
            .flatMap(b => Option(
              javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))))
            .map { img =>
              val raster = img.getRaster
              var s = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) { s += raster.getSample(x, y, 0); x += 1 }
                y += 1
              }
              ImageDims(mid, img.getWidth.toLong, img.getHeight.toLong, s)
            }
        }
      }
  }

  /** End-to-end real-codec round trip (the q_image_dims substrate): per id,
    * synthesize a deterministic grayscale PNG — width 16 + id%17, height
    * 16 + id%13, pixel(x, ·) = (x + id) mod 256 — through the REAL PNG
    * encoder, then decode it back with [[decodeImageDims]]'s kernel. The
    * decoded dims and raster sum are closed-form in id, so a SQL oracle can
    * verify the whole compression round trip exactly. */
  def imageDimsRoundtrip(df: DataFrame, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(id.cast("long").as("media_id")).as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val w = 16 + (mid % 17).toInt
          val h = 16 + (mid % 13).toInt
          (mid, encodePng(w, h, (x, _) => ((x + mid) % 256).toInt))
        }
      }.toDF("media_id", "content")
    decodeImageDims(encoded, col("media_id"), col("content")).toDF()
  }

  /** REAL codec: encode signed 16-bit mono little-endian PCM as a WAV
    * container via the JDK's javax.sound.sampled. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL codec: decode audio payloads (WAV/AIFF/AU PCM via
    * javax.sound.sampled) into (sample rate, frame count, signed sample
    * sum). 16-bit PCM only (the synthesis format); respects the container's
    * declared endianness. Undecodable/null payloads are dropped. */
  def decodeAudioFacts(df: DataFrame, id: Column, content: Column)
      : Dataset[AudioFacts] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), content.cast("binary").as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          Option(bytes).flatMap { b =>
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(b))
              try {
                val fmt = ais.getFormat
                require(fmt.getSampleSizeInBits == 16)
                val data = ais.readAllBytes()
                val n = data.length / 2
                var s = 0L
                var i = 0
                if (fmt.isBigEndian)
                  while (i < n) {
                    s += ((data(2 * i) << 8) | (data(2 * i + 1) & 0xFF)).toShort
                    i += 1
                  }
                else
                  while (i < n) {
                    s += ((data(2 * i + 1) << 8) | (data(2 * i) & 0xFF)).toShort
                    i += 1
                  }
                Some(AudioFacts(mid, fmt.getSampleRate.toLong, n.toLong, s))
              } finally ais.close()
            } catch { case _: Exception => None }
          }
        }
      }
  }

  /** End-to-end real-codec round trip (the q_audio_stats substrate): per id,
    * synthesize deterministic PCM — 8 kHz, n = 256 + (id%64)·4 samples,
    * sample(i) = (i·(1 + id%31)) mod 4096 − 2048 — through the REAL WAV
    * encoder, decode it back, emit rate/frames/signed sample sum. Closed
    * form in id, so a SQL oracle verifies the container round trip. */
  def audioFactsRoundtrip(df: DataFrame, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(id.cast("long").as("media_id")).as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val n = 256 + (mid % 64).toInt * 4
          val k = 1 + (mid % 31).toInt
          val samples = Array.tabulate(n)(i => ((i * k) % 4096 - 2048).toShort)
          (mid, encodeWav(8000, samples))
        }
      }.toDF("media_id", "content")
    decodeAudioFacts(encoded, col("media_id"), col("content")).toDF()
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
