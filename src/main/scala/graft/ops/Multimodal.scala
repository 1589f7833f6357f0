package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7 step 6): image/audio/video
  * content travels as opaque `binary` columns plus typed metadata —
  * exactly how a 100 TB multimodal corpus is stored (parquet binary +
  * sidecar metadata), and the same shape the reference gives every
  * message (`Payload.Data []byte`, `internal/broker/queue/queue.go:15-19`).
  *
  * The Spark-side plumbing — schema, per-partition batched processing,
  * deterministic feature shape — is real and tested. The actual codec call
  * is STUBBED ([[FakeCodec]]): this container has no image/audio
  * libraries, so decode is a clearly-marked deterministic fake with the
  * same signature a JNI/FFmpeg/JPEG decoder would have. Swap `FakeCodec`
  * for a real codec and nothing else changes.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** STUB decoder — stands in for the real native decode (JPEG/PNG/PCM/
    * H.264). Deterministic: 16-bin byte histogram, L1-normalized. A real
    * implementation would return pixel/sample tensors; everything
    * downstream (batching, schema, partitioning) is agnostic to that.
    */
  object FakeCodec {
    val FeatureDim = 16
    def decodeToFeatures(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      if (bytes == null || bytes.isEmpty) return hist
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) >> 4) += 1f
        i += 1
      }
      val n = bytes.length.toFloat
      var j = 0
      while (j < FeatureDim) { hist(j) /= n; j += 1 }
      hist
    }
  }

  /** Feature extraction over a media Dataset: per-partition imperative
    * loop (`mapPartitions`) because a real decoder amortizes native-lib
    * init per partition, not per row — the Scala analog of a batched
    * `mapInPandas` UDF.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: init native decoder once per partition here
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind,
          if (r.bytes == null) 0L else r.bytes.length.toLong,
          FakeCodec.decodeToFeatures(r.bytes))
      }
    }
  }

  /** Frame sampling for "video" payloads: treat the byte stream as
    * fixed-size frames, keep every nth — pure offset arithmetic on the
    * binary column, no decode needed (the real op on packetized codecs is
    * keyframe-index slicing, same shape).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    val nFrames = floor(octet_length(col("bytes")) / frameBytes).cast("int")
    media.withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(every)))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame",
        // substring on binary is 1-based
        expr(s"substring(bytes, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("frame"))
  }

  /** Metadata-level "resize" planning: compute target dims preserving
    * aspect ratio (the control-plane half of a resize; the pixel half
    * lives behind the codec stub).
    */
  def planResize(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide) / greatest(col("width"), col("height")).cast("double"), lit(1.0))
    media.select(col("media_id"), col("width"), col("height"),
      ceil(col("width") * scale).cast("long").as("target_w"),
      ceil(col("height") * scale).cast("long").as("target_h"))
  }

  /** Build a deterministic media table from the documents fixture: text
    * bytes stand in for encoded media (the fixtures ship no binary blobs).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic kind assignment
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 64).cast("int").as("height"))
}
