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

/** A sampled video frame (REAL decode — content is the frame re-encoded as
  * PNG; tsMs comes from the container's per-frame delay metadata). */
final case class MediaFrame(media_id: Long, frameIdx: Int, tsMs: Long,
    content: Array[Byte])

/** Decoded video-frame facts (REAL codec path — see
  * [[Multimodal.decodeVideoFrames]]). px_sum is the integer sum of the
  * frame's 8-bit intensities — a deterministic per-frame raster checksum. */
final case class VideoFrameFacts(media_id: Long, frame_idx: Long,
    width: Long, height: Long, px_sum: Long)

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
  * ==== Codec status — every modality is REAL ====
  * IMAGE encode/decode is REAL: the JDK ships PNG/JPEG/BMP/GIF codecs in
  * `javax.imageio` — [[encodePng]]/[[decodeImageDims]] run actual
  * compression round-trips (exercised oracle-backed by q_image_dims).
  * AUDIO encode/decode is REAL for PCM WAV/AIFF/AU: the JDK ships them in
  * `javax.sound.sampled` — [[encodeWav]]/[[decodeAudioFacts]] run actual
  * container round-trips (oracle-backed by q_audio_stats).
  * IMAGE resize and IMAGE feature extraction are REAL too
  * ([[resizeImages]]: decode → Graphics2D bilinear rescale → re-encode;
  * [[imageHistogramFeatures]]: decoded-intensity histogram vectors).
  * VIDEO is REAL via ImageIO's multi-frame GIF support (the one moving-
  * picture container the JDK ships a codec for): [[encodeGif]] writes a
  * true animated GIF sequence with per-frame delay metadata,
  * [[decodeVideoFrames]] decodes every frame back (oracle-backed by
  * q_video_frames), [[sampleFrames]] time-samples frames by the container's
  * own delay metadata and re-encodes each sampled frame as PNG, and
  * [[resizeVideos]] rescales every frame and re-encodes the sequence.
  * [[extractFeatures]] decodes ANY of the above (multi-frame aware; WAV
  * fallback for audio) into intensity/amplitude histogram features.
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

  /** LAZY frame stream (+ per-frame delay in centiseconds, 0 when the
    * container carries none) of any ImageIO-readable payload — single
    * images decode as one frame; animated GIFs as their full sequence.
    * Frames decode ONE AT A TIME on `next()`, so a long sequence streams
    * through a flatMap without ever materializing as a whole (only frame
    * HEADERS are parsed up front by getNumImages). Empty when no installed
    * codec accepts the bytes; a frame whose pixel data is corrupt ends the
    * stream at the last decodable frame. The reader/stream close when the
    * iterator is exhausted (both are in-memory, so an abandoned iterator
    * costs heap until GC, not descriptors). Executor-side only. */
  private def frameIterator(bytes: Array[Byte])
      : Iterator[(java.awt.image.BufferedImage, Int)] = {
    imageIoMemCache
    if (bytes == null) return Iterator.empty
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return Iterator.empty }
    val reader = readers.next()
    val n =
      try { reader.setInput(iis); reader.getNumImages(true) }
      catch { case _: Exception =>
        reader.dispose(); iis.close(); return Iterator.empty
      }
    // Prefetching iterator: decode happens inside hasNext, so a corrupt
    // frame cleanly ENDS the stream instead of throwing after hasNext
    // already promised an element.
    new Iterator[(java.awt.image.BufferedImage, Int)] {
      private var i = 0
      private var open = true
      private var pending: (java.awt.image.BufferedImage, Int) = _
      private def close(): Unit =
        if (open) { open = false; reader.dispose(); iis.close() }
      private def fetch(): Unit =
        if (pending == null && open && i < n) {
          try {
            val img = reader.read(i)
            // Delay metadata is best-effort: a metadata quirk (reader
            // returning null metadata, an empty/garbled delayTime attribute)
            // must never discard an already-decoded frame — it defaults the
            // delay to 0 instead of truncating the stream.
            val delay = try {
              var d = 0
              val meta = reader.getImageMetadata(i)
              if (meta != null) {
                val root = meta.getAsTree(meta.getNativeMetadataFormatName)
                var c = root.getFirstChild
                while (c != null) {
                  if (c.getNodeName == "GraphicControlExtension") {
                    val s = c.asInstanceOf[org.w3c.dom.Element]
                      .getAttribute("delayTime")
                    if (s != null && s.nonEmpty) d = s.toInt
                  }
                  c = c.getNextSibling
                }
              }
              d
            } catch { case _: Exception => 0 }
            pending = (img, delay)
            i += 1
            if (i >= n) close()
          } catch { case _: Exception => close() }
        }
      override def hasNext: Boolean = { fetch(); pending != null }
      override def next(): (java.awt.image.BufferedImage, Int) = {
        fetch()
        if (pending == null) throw new NoSuchElementException
        val r = pending
        pending = null
        r
      }
    }
  }

  /** Fully-materialized variant of [[frameIterator]] for kernels that need
    * the whole sequence at once (sequence re-encoding). None when the
    * payload is undecodable outright; a mid-sequence corrupt frame yields
    * the decodable prefix (same truncation semantics as the streaming
    * path). */
  private def readFrames(bytes: Array[Byte])
      : Option[IndexedSeq[(java.awt.image.BufferedImage, Int)]] = {
    val frames = frameIterator(bytes).toIndexedSeq
    if (frames.isEmpty) None else Some(frames)
  }

  /** Encode decoded frames back into an animated-GIF sequence (per-frame
    * delay in centiseconds preserved in GraphicControlExtension metadata). */
  private def writeGifSequence(
      frames: Iterator[(java.awt.image.BufferedImage, Int)]): Array[Byte] = {
    imageIoMemCache
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (img, delayCs) =>
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img),
          writer.getDefaultWriteParam)
        val fmt = meta.getNativeMetadataFormatName
        val root = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = new javax.imageio.metadata.IIOMetadataNode(
          "GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", delayCs.toString)
        gce.setAttribute("transparentColorIndex", "0")
        root.appendChild(gce)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** 8-bit intensity of a decoded pixel. Gray color spaces read the raw
    * raster sample masked to 8 bits (getRGB would run the lossy ICC
    * gray→sRGB transform; the mask keeps 16-bit grayscale rasters inside
    * the 8-bit histogram contract instead of overflowing it);
    * palette/RGB models go through `getRGB` — for indexed GIFs that is an
    * exact palette LOOKUP (a raw raster sample would be the palette index). */
  private def intensity(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
    if (img.getColorModel.getColorSpace.getType ==
        java.awt.color.ColorSpace.TYPE_GRAY)
      img.getRaster.getSample(x, y, 0) & 0xFF
    else img.getRGB(x, y) & 0xFF

  /** REAL feature extraction for ANY decodable payload — no byte-hash fakes:
    *  - ImageIO-decodable (PNG/JPEG/BMP/GIF incl. multi-frame video): the
    *    L1-normalized intensity histogram over ALL frames' pixels;
    *  - else 16-bit PCM audio (WAV/AIFF/AU): the L1-normalized amplitude
    *    histogram over `dim` equal bins of [-32768, 32768);
    *  - undecodable payloads are dropped (flatMap), mirroring the SQL
    *    null-dropping convention of the other decode kernels.
    * Multi-frame histograms are over each frame's RAW stored raster, with no
    * GIF disposal-method/offset compositing: for external GIFs that encode
    * later frames as partial deltas, the features describe the stored
    * rasters, not the rendered display. (Exact for full-frame sequences —
    * everything [[encodeGif]]/[[writeGifSequence]] produce.)
    * Iterator-in/iterator-out partition shape: one codec instance per task,
    * payloads materialized one at a time. */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 16)
      : Dataset[MediaFeatures] = {
    require(dim >= 1 && 256 % dim == 0, "dim must divide 256")
    val spark = ds.sparkSession
    import spark.implicits._
    val width = 256 / dim
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val frames = frameIterator(r.content) // streams: one frame in memory
        (if (frames.hasNext) {
          val hist = new Array[Long](dim)
          var n = 0L
          frames.foreach { case (img, _) =>
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                hist(intensity(img, x, y) / width) += 1
                x += 1
              }
              y += 1
            }
            n += img.getWidth.toLong * img.getHeight
          }
          Some(MediaFeatures(r.media_id, r.meta.kind, r.content.length.toLong,
            hist.map(c => c.toFloat / math.max(n, 1L))))
        } else None).orElse {
          decodePcmSamples(r.content).map { case (_, samples) =>
            val hist = new Array[Long](dim)
            val binW = 65536 / dim
            samples.foreach(s => hist((s + 32768) / binW) += 1)
            MediaFeatures(r.media_id, r.meta.kind, r.content.length.toLong,
              hist.map(c => c.toFloat / math.max(samples.length, 1)))
          }
        }
      }
    }
  }

  /** REAL video resize: decode every frame (GIF sequence), bilinear-rescale
    * each, re-encode the sequence with its original per-frame delays.
    * Container choice is keyed on `meta.kind`: anything declared `video`
    * stays a GIF sequence even at one frame (preserving its frame-delay
    * metadata — no silent container change on resize); other kinds with a
    * single frame take the [[resizeImages]] PNG path, and multi-frame
    * payloads always re-encode as a sequence (a PNG would drop frames).
    * Undecodable payloads pass through unchanged so mixed batches survive. */
  def resizeVideos(ds: Dataset[MediaRecord], w: Int, h: Int)
      : Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        readFrames(r.content).map { frames =>
          val scaled = frames.map { case (img, d) => (rescale(img, w, h), d) }
          val bytes =
            if (r.meta.kind == "video" || scaled.size > 1)
              writeGifSequence(scaled.iterator)
            else {
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(scaled.head._1, "png", bos)
              bos.toByteArray
            }
          r.copy(meta = r.meta.copy(width = w, height = h), content = bytes)
        }.getOrElse(r)
      }
    }
  }

  private def rescale(img: java.awt.image.BufferedImage, w: Int, h: Int)
      : java.awt.image.BufferedImage = {
    // custom/unknown (0) and palette-indexed sources rescale into full RGB
    // (drawing into an indexed target would re-quantize through its palette)
    val out = new java.awt.image.BufferedImage(w, h, img.getType match {
      case 0 => java.awt.image.BufferedImage.TYPE_INT_RGB
      case java.awt.image.BufferedImage.TYPE_BYTE_INDEXED =>
        java.awt.image.BufferedImage.TYPE_INT_RGB
      case t => t
    })
    val g = out.createGraphics()
    g.setRenderingHint(
      java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
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
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(rescale(img, w, h), "png", bos)
            r.copy(meta = r.meta.copy(width = w, height = h),
              content = bos.toByteArray)
          }
          .getOrElse(r)
      }
    }
  }

  /** REAL frame sampling: decode the video (multi-frame GIF) and keep one
    * frame per `everyMs` of PLAYBACK time — frame timestamps come from the
    * container's own per-frame delay metadata (centiseconds × 10), not from
    * byte math. Greedy deterministic sampling: a frame is kept when its
    * timestamp reaches the next sample point; each kept frame is re-encoded
    * as PNG (decoded pixels, palette-resolved). flatMap shape: output
    * cardinality ≈ Σ duration/everyMs, computed streaming per partition;
    * undecodable/non-video records are dropped. */
  def sampleFrames(ds: Dataset[MediaRecord], everyMs: Long)
      : Dataset[MediaFrame] = {
    require(everyMs > 0, "everyMs must be positive")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.meta.kind == "video").flatMap { r =>
      var tsMs = 0L
      var next = 0L
      frameIterator(r.content).zipWithIndex.flatMap { // streams frame-by-frame
        case ((img, delayCs), i) =>
          val out = if (tsMs >= next) {
            next = tsMs + everyMs
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            Some(MediaFrame(r.media_id, i, tsMs, bos.toByteArray))
          } else None
          tsMs += delayCs * 10L
          out
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

  /** REAL codec: encode a deterministic grayscale ANIMATED GIF — a true
    * multi-frame sequence written through ImageIO's GIF `ImageWriter`
    * (`prepareWriteSequence`/`writeToSequence`), with `delayCs` centiseconds
    * of playback delay per frame in GraphicControlExtension metadata.
    * `pixel(frame, x, y)` supplies 8-bit intensities. Runs inside executors. */
  def encodeGif(width: Int, height: Int, frames: Int, delayCs: Int,
      pixel: (Int, Int, Int) => Int): Array[Byte] =
    writeGifSequence((0 until frames).iterator.map { f =>
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raster.setSample(x, y, 0, pixel(f, x, y) & 0xFF); x += 1
        }
        y += 1
      }
      (img, delayCs)
    })

  /** REAL codec: decode video payloads (multi-frame GIF via ImageIO) into
    * one row PER FRAME with the frame's dimensions and 8-bit intensity sum
    * (palette-resolved via getRGB — a raster sample would be the palette
    * index). flatMap over an iterator-per-partition kernel: frames decode
    * lazily and stream out; a 2-hour video never materializes as a whole.
    * Null/undecodable payloads are dropped. */
  def decodeVideoFrames(df: DataFrame, id: Column, content: Column)
      : Dataset[VideoFrameFacts] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), content.cast("binary").as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          frameIterator(bytes).zipWithIndex.map { case ((img, _), i) =>
            var s = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { s += intensity(img, x, y); x += 1 }
              y += 1
            }
            VideoFrameFacts(mid, i.toLong, img.getWidth.toLong,
              img.getHeight.toLong, s)
          }
        }
      }
  }

  /** End-to-end real-codec round trip (the q_video_frames substrate): per
    * id, synthesize a deterministic animated GIF — 2 + id%4 frames of
    * width 8 + id%9, height 8 + id%7, pixel(f, x, ·) = (x + 7f + id) mod 256,
    * 4 cs/frame — through the REAL GIF sequence encoder, then decode every
    * frame back with [[decodeVideoFrames]]'s kernel. Frame count, dims, and
    * per-frame intensity sums are closed-form in id, so a SQL oracle
    * verifies the whole multi-frame round trip exactly. */
  def videoFramesRoundtrip(df: DataFrame, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(id.cast("long").as("media_id")).as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val w = 8 + (mid % 9).toInt
          val h = 8 + (mid % 7).toInt
          val n = 2 + (mid % 4).toInt
          (mid, encodeGif(w, h, n, delayCs = 4,
            (f, x, _) => ((x + 7L * f + mid) % 256).toInt))
        }
      }.toDF("media_id", "content")
    decodeVideoFrames(encoded, col("media_id"), col("content")).toDF()
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

  /** Decode a 16-bit PCM audio container (WAV/AIFF/AU) into (sample rate,
    * samples), respecting the container's declared endianness. None when
    * the bytes aren't decodable audio. Executor-side only. */
  private def decodePcmSamples(bytes: Array[Byte])
      : Option[(Long, Array[Short])] =
    Option(bytes).flatMap { b =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16)
          val data = ais.readAllBytes()
          val n = data.length / 2
          val out = new Array[Short](n)
          var i = 0
          if (fmt.isBigEndian)
            while (i < n) {
              out(i) = ((data(2 * i) << 8) | (data(2 * i + 1) & 0xFF)).toShort
              i += 1
            }
          else
            while (i < n) {
              out(i) = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xFF)).toShort
              i += 1
            }
          Some((fmt.getSampleRate.toLong, out))
        } finally ais.close()
      } catch { case _: Exception => None }
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
          decodePcmSamples(bytes).map { case (rate, samples) =>
            var s = 0L
            var i = 0
            while (i < samples.length) { s += samples(i); i += 1 }
            AudioFacts(mid, rate, samples.length.toLong, s)
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
