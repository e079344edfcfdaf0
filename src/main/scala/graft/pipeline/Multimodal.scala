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
