package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract stages.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is STUBBED with a deterministic fake (clearly marked
  * below); everything around it — schema, batch shape, partition-aware
  * processing via `mapPartitions` (the Scala analogue of `mapInPandas`:
  * one iterator per partition, amortizing any per-batch model/codec
  * setup) — is real and tested.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),        // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),      // image/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))  // audio/video

  final case class MediaRow(
      media_id: Long, kind: String, mime: String, payload: Array[Byte],
      width: Option[Int], height: Option[Int], duration_ms: Option[Long])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, byte_mean: Double, feature: Array[Float])

  /** Synthesize a media table from any id-bearing frame — payload bytes
    * are a deterministic function of the id (test plumbing; at production
    * scale this column comes from the lakehouse).
    */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      get(array(lit("image"), lit("audio"), lit("video")), pmod(col(idCol), lit(3)).cast("int")).as("kind"),
      lit("application/octet-stream").as("mime"),
      unhex(sha2(col(idCol).cast("string"), 256)).as("payload"),
      lit(64).as("width"), lit(64).as("height"), lit(1000L).as("duration_ms"))

  /** ==== STUB ====
    * Deterministic fake decode: a real deployment would decode
    * JPEG/PCM/H264 here (e.g. via javacv) and emit a resized thumbnail /
    * frame sample / spectrogram. This fake derives an 8-float feature
    * vector from the payload bytes so the distributed plumbing (schema,
    * batching, partition iteration) is fully exercisable without codecs.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) { out(i % 8) += (payload(i) & 0xFF) / 255.0f; i += 1 }
    out
  }

  final case class Thumbnail(media_id: Long, width: Int, height: Int, pixels: Array[Byte])
  final case class FrameSample(media_id: Long, frame_idx: Int, offset_ms: Long, frame: Array[Byte])

  /** ==== STUB ==== Resize: a real build decodes + bilinear-resizes; the
    * fake tiles the payload bytes into a w×h buffer so output schema,
    * sizing math and the per-partition batching are real.
    */
  def resize(media: DataFrame, w: Int, h: Int): Dataset[Thumbnail] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val out = new Array[Byte](w * h)
          var i = 0
          while (i < out.length) { out(i) = payload(i % math.max(payload.length, 1)); i += 1 }
          Thumbnail(id, w, h, out)
        }
      }
  }

  /** ==== STUB ==== Frame sampling for video rows: emits `n` evenly-spaced
    * frames per media item (1 row in → n rows out — the flatMap shape a
    * real demuxer needs); frame bytes are a deterministic slice of the
    * payload.
    */
  def sampleFrames(media: DataFrame, n: Int): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "payload", "duration_ms").as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload, durMs) =>
          (0 until n).map { f =>
            val off = if (n == 1) 0L else durMs * f / (n - 1)
            val start = if (payload.isEmpty) 0 else (f * payload.length / math.max(n, 1)) % payload.length
            FrameSample(id, f, off, payload.slice(start, math.min(start + 8, payload.length)))
          }
        }
      }
  }

  /** Feature extraction over media rows: one `mapPartitions` pass — codec
    * init happens once per partition, rows stream through (the Scala
    * equivalent of a batched `mapInPandas` UDF). Input must have
    * `mediaSchema` columns.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec setup would go here (once, not per row)
        rows.map { case (id, kind, payload) =>
          val feat = decodeStub(payload)
          val bytes = payload.length
          val mean = if (bytes == 0) 0.0 else payload.map(b => (b & 0xFF).toDouble).sum / bytes
          MediaFeatures(id, kind, bytes, mean, feat)
        }
      }
  }
}
