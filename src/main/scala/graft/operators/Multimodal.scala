package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as partition-local typed transforms
  * (north-star extension).
  *
  * IMAGE decoding is REAL: `javax.imageio` (in the JDK — no extra
  * dependency) decodes PNG / BMP / GIF / JPEG payloads on the executors,
  * and feature extraction / resize operate on actual pixels. Audio/video
  * codecs are NOT available in this environment, so those kernels remain
  * ===== STUBS =====: deterministic fakes that stand in for ffmpeg calls.
  * Everything around them — schema shape, metadata struct, per-partition
  * batched execution, null handling — is the real plumbing a cluster job
  * would use: mapPartitions keeps decoding off the driver, one task per
  * input split, no shuffle.
  */
object Multimodal {

  /** Typed metadata carried alongside the binary payload. */
  case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  case class MediaRow(media_id: Long, media: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      brightness: Double,
      edge_density: Double
  )

  /** Wrap a string column as a binary media payload with metadata — builds
    * a multimodal-shaped table from any text source (test/demo harness). */
  def toMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit("fake/raw").as("format"),
        lit(64).as("width"),
        lit(64).as("height"),
        length(col(payloadCol)).cast("long").as("nBytes")
      ).as("meta")
    )

  /** Real image decode via the JDK's ImageIO: returns (brightness in [0,1],
    * edge density in [0,1], width, height) from actual pixels — brightness
    * is mean Rec.601 luma, edge density the fraction of horizontal neighbor
    * pairs whose luma differs by > 32/255. Returns None when the payload is
    * not a decodable image (caller falls back to [[stubDecodeBytes]]).
    * ImageIO's disk cache is disabled: executor-side decode must not write
    * scratch files. */
  private def decodeImageFeatures(
      bytes: Array[Byte]
  ): Option[(Double, Double, Int, Int)] = {
    if (bytes == null || bytes.isEmpty) None
    else {
      javax.imageio.ImageIO.setUseCache(false)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0.0
        var edges = 0L
        var y = 0
        while (y < h) {
          var x = 0
          var prev = -1.0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            sum += luma
            if (prev >= 0 && math.abs(luma - prev) > 32) edges += 1
            prev = luma
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some((sum / n / 255.0, edges.toDouble / n, w, h))
      }
    }
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM — no extra dependency): returns (RMS level in [0,1],
    * zero-crossing rate in [0,1]) over the first channel's samples — the
    * standard cheap loudness/pitchiness features. Returns None when the
    * payload is not a decodable audio stream (caller falls back to
    * [[stubDecodeBytes]]). */
  private def decodeAudioFeatures(bytes: Array[Byte]): Option[(Double, Double)] = {
    if (bytes == null || bytes.isEmpty) None
    else {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in =
        try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException                               => null
        }
      if (in == null) None
      else
        try {
          val fmt = in.getFormat
          val pcmSigned = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16
          if (!pcmSigned) None // keep the kernel minimal: 16-bit PCM only
          else {
            val data = in.readAllBytes()
            val channels = fmt.getChannels
            val frameBytes = 2 * channels
            val n = data.length / frameBytes
            if (n == 0) Some((0.0, 0.0))
            else {
              var sumSq = 0.0
              var crossings = 0L
              var prevNeg = false
              var i = 0
              while (i < n) {
                val off = i * frameBytes
                // first channel, respecting stream endianness
                val s =
                  if (fmt.isBigEndian)
                    ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                  else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
                val x = s / 32768.0
                sumSq += x * x
                val neg = x < 0
                if (i > 0 && neg != prevNeg) crossings += 1
                prevNeg = neg
                i += 1
              }
              Some((math.sqrt(sumSq / n), crossings.toDouble / n))
            }
          }
        } finally in.close()
    }
  }

  /** Perceptual audio fingerprint per payload: REAL 16-bit-PCM decode
    * (javax.sound — same kernel as [[decodeAudioFeatures]]), the first
    * channel's ENERGY ENVELOPE block-averaged into 65 equal windows, then
    * 64 bits of envelope gradient sign — the audio analogue of
    * [[imageDHash]] (time replaces the x-axis, RMS energy replaces luma).
    * Near-identical recordings — re-encoded, slightly trimmed, volume-
    * shifted (gradient SIGNS are level-invariant) — land within a few
    * bits; feed [[Dedup.dedupByHamming]]. Undecodable payloads are
    * omitted. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudioEnvelope(r.media, 65).map { env =>
          var bits = 0L
          var k = 0
          while (k < 64) {
            if (env(k) > env(k + 1)) bits |= (1L << k)
            k += 1
          }
          (r.media_id, bits)
        }
      }
    }.toDF("media_id", "afp")
  }

  /** First-channel RMS energy in `nWindows` equal sample windows (None if
    * not decodable 16-bit PCM or fewer samples than windows). */
  private def decodeAudioEnvelope(
      bytes: Array[Byte],
      nWindows: Int
  ): Option[Array[Double]] = {
    if (bytes == null || bytes.isEmpty) None
    else {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in =
        try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException                               => null
        }
      if (in == null) None
      else
        try {
          val fmt = in.getFormat
          val pcmSigned = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16
          if (!pcmSigned) None
          else {
            val data = in.readAllBytes()
            val channels = fmt.getChannels
            val frameBytes = 2 * channels
            val n = data.length / frameBytes
            if (n < nWindows) None
            else {
              val env = new Array[Double](nWindows)
              var w = 0
              while (w < nWindows) {
                val i0 = w * n / nWindows
                val i1 = math.max(i0 + 1, (w + 1) * n / nWindows)
                var sumSq = 0.0
                var i = i0
                while (i < i1) {
                  val off = i * frameBytes
                  val s =
                    if (fmt.isBigEndian)
                      ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                    else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
                  val x = s / 32768.0
                  sumSq += x * x
                  i += 1
                }
                env(w) = math.sqrt(sumSq / (i1 - i0))
                w += 1
              }
              Some(env)
            }
          }
        } finally in.close()
    }
  }

  /** REAL AVI (RIFF) container walk: returns the video-frame chunk
    * payloads — `##dc`/`##db` chunks, which in an MJPEG AVI are complete
    * JPEG images the JDK can decode. Pure byte-walk (fourcc + LE32 size,
    * word-aligned, LIST chunks descended), no codecs involved; returns
    * empty for anything that is not a well-formed AVI. */
  private[operators] def aviVideoFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def le32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes == null || bytes.length < 12) return Nil
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Nil
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(p)
        val size = le32(p + 4)
        val body = p + 8
        if (size < 0 || body + size > end) return // malformed: stop
        if (id == "LIST" && size >= 4) {
          walk(body + 4, body + size.toInt) // skip the 4-byte list type
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          frames += java.util.Arrays.copyOfRange(bytes, body, body + size.toInt)
        }
        p = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length)
    frames.result()
  }

  /** REAL decoder for MJPEG-AVI video payloads: walk the RIFF container,
    * ImageIO-decode each JPEG frame, and average the per-frame
    * brightness / edge-density — None when no frame decodes (non-AVI or
    * non-JPEG codec), letting callers fall back to the stub. */
  private def decodeVideoFeatures(bytes: Array[Byte]): Option[(Double, Double)] = {
    val decoded = aviVideoFrames(bytes).flatMap(decodeImageFeatures)
    if (decoded.isEmpty) None
    else
      Some(
        (
          decoded.map(_._1).sum / decoded.size,
          decoded.map(_._2).sum / decoded.size
        )
      )
  }

  /** ===== STUB ===== deterministic fake decoder for video payloads in
    * codecs the JDK cannot touch (H.264 etc. — MJPEG-AVI is decoded for
    * real above): fakes luma statistics from raw bytes. A real
    * implementation calls ffmpeg here (the only line that changes);
    * signature and batch shape are the production ones. */
  private def stubDecodeBytes(bytes: Array[Byte]): (Double, Double) = {
    if (bytes == null || bytes.isEmpty) (0.0, 0.0)
    else {
      var sum = 0L
      var transitions = 0L
      var prev = bytes(0)
      bytes.foreach { b =>
        sum += (b & 0xff)
        if (((b ^ prev) & 0x80) != 0) transitions += 1
        prev = b
      }
      (sum.toDouble / bytes.length / 255.0,
        transitions.toDouble / bytes.length)
    }
  }

  /** Decode + feature-extract: partition-local, batched, executor-side.
    * Image payloads (format starting with "image/") and audio payloads
    * (format starting with "audio/") are decoded for real (ImageIO /
    * javax.sound); other formats use the stub kernel. For audio the
    * `brightness` slot carries the RMS level and `edge_density` the
    * zero-crossing rate — the same "level + activity" pair. (Real
    * pipelines hold a codec context per partition — exactly the shape
    * mapPartitions provides: init once per task, stream the rows.) */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init of the decoder context happens here
      rows.map { r =>
        val fmt = r.meta.format
        val real =
          if (fmt != null && fmt.startsWith("image/"))
            decodeImageFeatures(r.media).map { case (b, e, _, _) => (b, e) }
          else if (fmt != null && fmt.startsWith("audio/"))
            decodeAudioFeatures(r.media)
          else if (fmt != null && fmt.startsWith("video/"))
            decodeVideoFeatures(r.media)
          else None
        val (brightness, edges) = real.getOrElse(stubDecodeBytes(r.media))
        MediaFeatures(r.media_id, r.meta.format, r.meta.nBytes, brightness, edges)
      }
    }
  }

  /** Perceptual difference-hash (dHash) per image payload: REAL ImageIO
    * decode, block-average down to a 9x8 luma grid (own deterministic
    * averaging — no Graphics2D resampler variance across JDKs), then 64
    * bits of horizontal gradient sign (bit set iff cell luma > its right
    * neighbor). Near-identical images — recompressed, slightly edited,
    * resized — land within a few bits of each other, so the output
    * (media_id, dhash) table feeds [[Dedup.dedupByHamming]] directly:
    * image near-dup detection with the exact same quarter-bucket
    * pigeonhole scale shape as text SimHash. Rows whose payload does not
    * decode as an image are OMITTED (they cannot be perceptually hashed).
    */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
          catch { case _: java.io.IOException => null }
        if (img == null) None else Some((r.media_id, dHashOf(img)))
      }
    }.toDF("media_id", "dhash")
  }

  /** The 9x8 block-average gradient hash of a decoded image (shared by the
    * image and video fingerprint paths). */
  private def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = Array.ofDim[Double](8, 9)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 9) {
        val x0 = i * w / 9
        val x1 = math.min(w, math.max(x0 + 1, (i + 1) * w / 9))
        val y0 = j * h / 8
        val y1 = math.min(h, math.max(y0 + 1, (j + 1) * h / 8))
        var sum = 0.0
        var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        grid(j)(i) = if (n == 0) 0.0 else sum / n
        i += 1
      }
      j += 1
    }
    var bits = 0L
    var k = 0
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (grid(gy)(gx) > grid(gy)(gx + 1)) bits |= (1L << k)
        k += 1
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Perceptual video fingerprint — real for MJPEG-AVI payloads (RIFF
    * walk + JDK JPEG decode; see [[aviVideoFrames]]). Samples up to
    * `maxFrames` EVENLY SPACED decodable frames (an undecodable frame
    * falls forward to the next decodable one), [[dHashOf]]-hashes each,
    * and combines them by PER-BIT MAJORITY VOTE (ties set the bit) — the
    * SimHash trick applied across time. With `maxFrames = 1` (default)
    * this is exactly the first-decodable-frame hash.
    *
    * Why vote: a first-frame-only hash misses a copy whose opening frame
    * was replaced (new title card) but whose content is identical; with
    * k sampled frames, k-1 agreeing frame hashes out-vote the one edit,
    * so the voted hashes still land within [[Dedup.dedupByHamming]]'s
    * radius. A re-muxed or re-leveled copy of the same footage keeps
    * voting identically. Payloads with no decodable frame are omitted.
    *
    * Scale shape: per-row decode work only (mapPartitions for codec
    * context reuse, as [[imageDHash]]); output is one skinny
    * (media_id, dhash) row per video regardless of maxFrames. */
  def videoDHash(media: DataFrame, maxFrames: Int = 1): DataFrame = {
    require(maxFrames >= 1, "maxFrames must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      def decode(frame: Array[Byte]): java.awt.image.BufferedImage =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
        catch { case _: java.io.IOException => null }
      rows.flatMap { r =>
        val frames = aviVideoFrames(r.media).toIndexedSeq
        val n = frames.size
        val k = math.min(maxFrames, n)
        // evenly spaced target indices across [0, n-1]
        val targets =
          if (k <= 1) Seq(0).filter(_ < n)
          else (0 until k).map(i => i * (n - 1) / (k - 1))
        val used = scala.collection.mutable.BitSet.empty
        val hashes = targets.flatMap { t =>
          Iterator
            .range(t, n)
            .filterNot(used)
            .map(i => i -> decode(frames(i)))
            .collectFirst { case (i, img) if img != null =>
              used += i
              dHashOf(img)
            }
        }
        if (hashes.isEmpty) None
        else {
          var bits = 0L
          var b = 0
          while (b < 64) {
            val ones = hashes.count(h => ((h >>> b) & 1L) == 1L)
            if (2 * ones >= hashes.size) bits |= (1L << b)
            b += 1
          }
          Some((r.media_id, bits))
        }
      }
    }.toDF("media_id", "dhash")
  }

  /** Resize. Image payloads are REALLY resized: decode via ImageIO,
    * bilinear-draw onto a width x height canvas, re-encode as PNG (the
    * JDK's lossless writer, so round-trips are exact). Non-image payloads
    * keep the ===== STUB ===== behavior (deterministic prefix truncation)
    * so tests can assert payload/metadata coherence without codecs. */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, "width and height must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val realImage =
          if (r.meta.format != null && r.meta.format.startsWith("image/")) {
            javax.imageio.ImageIO.setUseCache(false)
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
              catch { case _: java.io.IOException => null }
            Option(img).map { src =>
              val dst = new java.awt.image.BufferedImage(
                width, height, java.awt.image.BufferedImage.TYPE_INT_RGB
              )
              val g = dst.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR
              )
              g.drawImage(src, 0, 0, width, height, null)
              g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              out.toByteArray
            }
          } else None
        realImage match {
          case Some(png) =>
            MediaRow(
              r.media_id,
              png,
              MediaMeta("image/png", width, height, png.length.toLong)
            )
          case None =>
            val target = math.max(1, math.min(r.media.length, width * height / 16))
            MediaRow(
              r.media_id,
              java.util.Arrays.copyOf(r.media, target),
              MediaMeta(r.meta.format, width, height, target.toLong)
            )
        }
      }
    }.toDF()
  }

  /** Frame sampling: one row per sampled frame. AVI payloads are demuxed
    * for REAL (RIFF walk — each `##dc` chunk is a complete JPEG in MJPEG
    * files) and every `stride`-th actual frame is emitted; other formats
    * keep the ===== STUB ===== behavior (every `stride`-th `frameBytes`
    * chunk of the raw payload) so the explode shape is testable without
    * codecs. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val real = aviVideoFrames(r.media)
      val frames =
        if (real.nonEmpty) real else r.media.grouped(frameBytes).toSeq
      frames.zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 =>
          (r.media_id, i, chunk)
      }
    }.toDF("media_id", "frame_index", "frame")
  }

  /** One capability-report row: can payloads of `format` be decoded for
    * REAL on this JVM (vs. falling back to the stub kernel), and by what
    * engine. */
  case class CodecSupport(format: String, real: Boolean, engine: String)

  /** Machine-readable decode-capability report — the codec honesty banner
    * as DATA, so pipelines can route unsupported media to the stub kernel
    * DELIBERATELY (see [[withDecodePath]]) instead of discovering the
    * boundary per-row. Image entries probe the installed ImageIO readers;
    * the audio and video entries run tiny in-memory fixtures through the
    * SAME private kernels [[extractFeatures]] uses, so the report matches
    * decode behavior by construction — if an audio/video SPI ever appears
    * on the classpath, the report flips with it. Driver-side, a few
    * milliseconds, no Spark job. */
  def supportedCodecs(): Seq[CodecSupport] = {
    def imgReader(mime: String): Boolean =
      javax.imageio.ImageIO.getImageReadersByMIMEType(mime).hasNext
    val sound = "javax.sound.sampled (16-bit PCM only)"
    val none = "none in the JDK; coursier-offline environment, no ffmpeg"
    Seq(
      CodecSupport("image/png", imgReader("image/png"), "javax.imageio"),
      CodecSupport("image/jpeg", imgReader("image/jpeg"), "javax.imageio"),
      CodecSupport("image/bmp", imgReader("image/bmp"), "javax.imageio"),
      CodecSupport("image/gif", imgReader("image/gif"), "javax.imageio"),
      CodecSupport("image/tiff", imgReader("image/tiff"), "javax.imageio"),
      CodecSupport("image/webp", imgReader("image/webp"), "javax.imageio"),
      CodecSupport("audio/wav", decodeAudioFeatures(probeWav).isDefined, sound),
      CodecSupport("audio/mpeg", decodeAudioFeatures(probeMp3).isDefined, none),
      CodecSupport(
        "video/x-msvideo",
        decodeVideoFeatures(probeMjpegAvi).isDefined,
        "RIFF demux + javax.imageio JPEG frames (MJPEG-AVI only)"),
      CodecSupport("video/mp4", decodeVideoFeatures(probeMp4).isDefined, none),
      CodecSupport("video/webm", decodeVideoFeatures(probeWebm).isDefined, none)
    )
  }

  /** Adds `decode_real`: whether this row's `meta.format` routes to a
    * REAL decoder per [[supportedCodecs]] — the deliberate routing column
    * (filter real rows into decode stages, send the rest to stubs or a
    * quarantine sink). Per-row InSet probe, no shuffle. A NULL
    * `meta.format` routes FALSE (stub/quarantine), not NULL — a bare
    * `isin` would yield NULL there, and such rows would vanish from BOTH
    * `filter(decode_real)` and `filter(!decode_real)`. */
  def withDecodePath(media: DataFrame): DataFrame = {
    val real = supportedCodecs().filter(_.real).map(_.format)
    media.withColumn(
      "decode_real",
      coalesce(col("meta.format").isin(real: _*), lit(false)))
  }

  /** Minimal 16-bit PCM mono WAV (4 samples) for the capability probe. */
  private def probeWav: Array[Byte] = {
    val samples = Array[Short](0, 8000, -8000, 16000)
    val data = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = data.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      data.write(Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte))
    def le16(v: Int): Unit = data.write(Array[Byte](v.toByte, (v >> 8).toByte))
    val nBytes = samples.length * 2
    ascii("RIFF"); le32(36 + nBytes); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000)
    le16(2); le16(16)
    ascii("data"); le32(nBytes)
    samples.foreach(s => le16(s.toInt & 0xffff))
    data.toByteArray
  }

  /** An MPEG-1 Layer III frame-sync header + silence — enough for any
    * installed mp3 SPI to accept, rejected by the bare JDK. */
  private def probeMp3: Array[Byte] =
    Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x00) ++
      new Array[Byte](413)

  /** One-frame MJPEG AVI (RIFF/AVI movi list with a single 00dc JPEG
    * chunk) for the capability probe — same builder shape as the demux
    * suite's fixtures. */
  private def probeMjpegAvi: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(128, 128, 128))
    g.fillRect(0, 0, 8, 8)
    g.dispose()
    val jpg = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "jpg", jpg)
    def le32(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      fourcc.getBytes("US-ASCII") ++ le32(body.length) ++ padded
    }
    val movi = "movi".getBytes("US-ASCII") ++ chunk("00dc", jpg.toByteArray)
    val riffBody = "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi)
    "RIFF".getBytes("US-ASCII") ++ le32(riffBody.length) ++ riffBody
  }

  /** Minimal ISO-BMFF `ftyp` box — a syntactically real MP4 head the
    * RIFF demux must NOT claim. */
  private def probeMp4: Array[Byte] =
    Array[Byte](0, 0, 0, 20) ++ "ftypisom".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 2, 0) ++ "isom".getBytes("US-ASCII")

  /** Minimal EBML head (the WebM/Matroska magic). */
  private def probeWebm: Array[Byte] =
    Array[Byte](0x1A, 0x45.toByte, 0xDF.toByte, 0xA3.toByte) ++
      new Array[Byte](16)
}
