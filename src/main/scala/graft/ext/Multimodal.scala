package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, partition-friendly batch decode via mapPartitions.
  *
  * The decode itself is a STUB (no image/audio codecs in this environment):
  * [[StubDecoder.decode]] produces deterministic fake features from the
  * bytes. Everything around it — schema, encoder, per-partition batching,
  * feature struct — is the real Spark plumbing a production decoder drops
  * into.
  *
  * Scale design: decode runs inside mapPartitions (one decoder instance per
  * partition, amortized init — exactly how a JNI/codec handle would be
  * held); media bytes never shuffle (features are extracted before any
  * aggregation); partition sizing is the caller's lever via
  * `spark.sql.files.maxPartitionBytes`.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media_type: String, media: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      channels: Int,
      checksum: Long)

  /** STUB decoder — deterministic fake dimensions derived from the payload.
    * A real implementation would parse the container header / decode frames
    * here; the signature (bytes in, typed features out) is the contract. */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val len = r.media.length.toLong
      // cheap deterministic checksum of the payload (not a crypto hash)
      var cs = 1125899906842597L
      var i = 0
      while (i < r.media.length) { cs = 31 * cs + r.media(i); i += 1 }
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        byte_len = len,
        width = (len % 640).toInt,
        height = ((len * 7) % 480).toInt,
        channels = 3,
        checksum = cs)
    }
  }

  /** Fixture adapter: documents.text bytes stand in for media payloads. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), lit("image/fake").as("media_type"),
      col("text").cast("binary").as("media")).as[MediaRecord]
  }

  /** Batch feature extraction: one decoder per partition, media never
    * shuffles. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec handles, JNI, …)
      it.map(StubDecoder.decode)
    }
  }
}
