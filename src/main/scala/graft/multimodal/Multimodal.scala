package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct, and decode / feature
  * extraction runs as partition-local batch transforms.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container — see the deterministic fake in [[decodeImageStub]]); the
  * Spark-side contract is real: schema, batch shape, partitioning, and the
  * `mapPartitions` execution path (the Scala analog of `mapInPandas` —
  * one iterator per partition so a real decoder could amortize model/codec
  * init across the batch, which is exactly how a GPU feature extractor
  * would be mounted).
  */
object Multimodal {

  /** A media row: opaque payload + metadata. `media_type` would come from a
    * manifest; byte length and magic tag are derived from the payload. */
  case class MediaRow(media_id: Long, payload: Array[Byte], media_type: String,
      byte_len: Long, magic_hex: String)

  /** Fixed-shape fake features (stands in for a CNN/CLIP embedding). */
  case class MediaFeatures(media_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, features: Array[Float])

  /** Wrap any table with a binary payload column into the media schema.
    * (Test corpus carries no real media, so the documents table's utf-8
    * bytes act as payloads — the plumbing doesn't care.) */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      // type sniff from payload size — a stand-in for magic-byte dispatch
      when(length(col(payloadCol).cast("binary")) % 3 === 0, "image")
        .when(length(col(payloadCol).cast("binary")) % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      length(col(payloadCol).cast("binary")).cast("long").as("byte_len"),
      substring(lower(hex(col(payloadCol).cast("binary"))), 1, 16).as("magic_hex"))
      .as[MediaRow]
  }

  /** STUB decoder: deterministic fake "decode + feature-extract" in place of
    * a real codec (===  the step that would call libjpeg/ffmpeg/a vision
    * model). Partition-local: state (here a reusable buffer; in production a
    * codec context or model session) is created once per partition and
    * reused across the batch — the property that matters for throughput. */
  def decodeImageStub(media: Dataset[MediaRow], featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (once), not per row
      val buf = new Array[Float](featureDim)
      rows.map { r =>
        // deterministic fake: dims from byte length, features = byte
        // histogram moments over `featureDim` buckets
        var i = 0
        while (i < featureDim) { buf(i) = 0f; i += 1 }
        var j = 0
        while (j < r.payload.length) {
          buf((r.payload(j) & 0xff) % featureDim) += 1f
          j += 1
        }
        val n = math.max(r.payload.length, 1).toFloat
        MediaFeatures(r.media_id, r.media_type, r.byte_len,
          width = (r.byte_len % 640L).toInt + 1,
          height = (r.byte_len % 480L).toInt + 1,
          features = buf.map(_ / n))
      }
    }
  }

  /** Resize stub: recompute the (fake) decoded dimensions to fit inside a
    * bounding box, preserving aspect ratio — the metadata-level contract of
    * a real resize (the pixel transform itself would live next to the codec
    * in [[decodeImageStub]]'s partition-local loop). Pure Column math: the
    * scale factor is min(maxW/w, maxH/h, 1) and output dims round down. */
  def resizeStub(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    val scale = least(
      lit(maxW).cast("double") / $"width".cast("double"),
      lit(maxH).cast("double") / $"height".cast("double"),
      lit(1.0))
    features.toDF()
      .withColumn("resized_w", floor($"width" * scale).cast("int"))
      .withColumn("resized_h", floor($"height" * scale).cast("int"))
  }

  /** Frame-sampling stub for video-typed rows: emit one row per sampled
    * "frame" (flatMap shape — the row-expansion contract of real frame
    * extraction), sampling every `stride`-th byte offset as a frame key. */
  def sampleFramesStub(media: Dataset[MediaRow], stride: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter($"media_type" === "video")
      .withColumn("frame_offset",
        explode(sequence(lit(0L),
          greatest(expr(s"(byte_len - 1) div $stride"), lit(0L)))))
      .select($"media_id", ($"frame_offset" * stride).as("byte_offset"), $"byte_len")
  }
}
