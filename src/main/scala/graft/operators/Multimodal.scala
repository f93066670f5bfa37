package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as partition-local typed transforms
  * (north-star extension).
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels below are ===== STUBS =====: deterministic fakes that
  * stand in for libjpeg/ffmpeg calls. Everything around them — schema
  * shape, metadata struct, per-partition batched execution, null handling —
  * is the real plumbing a cluster job would use. Swap `stubDecodeBytes`
  * with a real codec and the pipeline is production-shaped: mapPartitions
  * keeps decoding off the driver, one task per input split, no shuffle.
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

  /** ===== STUB ===== deterministic fake decoder: pretends to decode a
    * compressed image into luma statistics. A real implementation calls the
    * codec here (the only line that changes); signature and batch shape are
    * the production ones. */
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
    * (Real pipelines would hold a codec context per partition — exactly the
    * shape mapPartitions provides: init once per task, stream the rows.) */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init of the (stub) decoder context happens here
      rows.map { r =>
        val (brightness, edges) = stubDecodeBytes(r.media)
        MediaFeatures(r.media_id, r.meta.format, r.meta.nBytes, brightness, edges)
      }
    }
  }

  /** ===== STUB ===== resize: real impl re-encodes pixels; the fake keeps a
    * deterministic prefix so tests can assert payload/metadata coherence. */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].map { r =>
      val target = math.max(1, math.min(r.media.length, width * height / 16))
      MediaRow(
        r.media_id,
        java.util.Arrays.copyOf(r.media, target),
        MediaMeta(r.meta.format, width, height, target.toLong)
      )
    }.toDF()
  }

  /** ===== STUB ===== frame sampling for video-shaped payloads: returns
    * every `stride`-th chunk of the payload as a frame (real impl: demux +
    * keyframe extraction). Output is one row per sampled frame — the
    * explode shape a real frame sampler produces. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val frames = r.media.grouped(frameBytes).toSeq
      frames.zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 =>
          (r.media_id, i, chunk)
      }
    }.toDF("media_id", "frame_index", "frame")
  }
}
