package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schema, batch iteration via `mapPartitions`,
  * partition sizing) is real; the codec itself is STUBBED with a
  * deterministic fake (this container has no image/audio libraries —
  * marked [STUB] below). Swapping in a real codec only changes the body of
  * `decodeBytes`.
  *
  * Scale notes: media rows are wide (MBs); the operators below avoid
  * shuffling payload bytes — metadata is computed in a narrow map and
  * payloads are dropped as early as possible (`select` pruning reaches the
  * parquet scan, so a metadata-only query never reads the bytes).
  */
object Multimodal {

  /** Typed metadata envelope for a media payload. */
  case class MediaMeta(
      media_id: Long,
      kind: String,          // image | audio | video
      byte_len: Long,
      content_md5: String)

  /** Stub decoded-media descriptor ([STUB] deterministic fake dims). */
  case class DecodedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Attach a media envelope to a DataFrame with a binary `payload` column:
    * validates presence, derives byte length + digest. Pure column ops.
    */
  def withMediaMeta(df: DataFrame, idCol: String, payloadCol: String, kind: org.apache.spark.sql.Column): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      kind.as("kind"),
      octet_length(col(payloadCol)).cast("long").as("byte_len"),
      md5(col(payloadCol)).as("content_md5"),
      col(payloadCol).as("payload"))

  /** [STUB] "Decode" a payload: a real implementation would call an image /
    * audio codec here. The fake derives deterministic dimensions from the
    * byte length and a fixed-size feature vector from the bytes, so the
    * pipeline shape (per-partition batched decode, typed output) is real
    * and testable.
    */
  def decodeBytes(id: Long, kind: String, bytes: Array[Byte]): DecodedMedia = {
    val n = bytes.length
    val feature = new Array[Float](8)
    var i = 0
    while (i < n) { feature(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    DecodedMedia(
      media_id = id,
      kind = kind,
      width = if (kind == "image" || kind == "video") 64 + (n % 640) else 0,
      height = if (kind == "image" || kind == "video") 64 + (n % 480) else 0,
      sample_rate = if (kind == "audio") 16000 else 0,
      n_frames = if (kind == "video") 1 + (n % 30) else if (kind == "image") 1 else 0,
      feature = feature)
  }

  /** Distributed decode: `mapPartitions` over (media_id, kind, payload) so a
    * real codec could amortize per-batch setup (model load, decoder init)
    * once per partition — the Scala analog of `mapInPandas` batching.
    */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // [STUB] per-partition codec init would go here
        it.map { case (id, kind, bytes) => decodeBytes(id, kind, bytes) }
      }
  }

  /** Frame sampling plan for video payloads: every `stride`-th frame index.
    * Metadata-only (no byte shuffling); the decode of selected frames would
    * ride on `decode` above.
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(when(col("n_frames") > 0, sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))

  /** [STUB] resize plan: records target dims; a real implementation would
    * re-encode bytes in `decode`'s partition loop.
    */
  def resizePlan(decoded: DataFrame, w: Int, h: Int): DataFrame =
    decoded.select(col("media_id"), col("width"), col("height"),
      lit(w).as("target_width"), lit(h).as("target_height"),
      (col("width") * col("height") > w * h).as("downscale"))
}
