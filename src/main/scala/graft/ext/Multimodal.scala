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

  /** A decoded-and-resized thumbnail record (stub payload). */
  final case class Thumbnail(doc_id: Long, width: Int, height: Int, thumb: Array[Byte])

  /** A sampled frame from a (fake) video payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, offset: Long, frame: Array[Byte])

  /** STUB resize: a real implementation scales pixels; the stub takes a
    * deterministic byte stride so output size tracks the requested dims. */
  def resizeStub(r: MediaRecord, w: Int, h: Int): Thumbnail = {
    val target = math.max(1, math.min(r.media.length, w * h / 64))
    val stride = math.max(1, r.media.length / target)
    val out = Array.tabulate(target)(i => r.media(math.min(i * stride, r.media.length - 1)))
    Thumbnail(r.doc_id, w, h, out)
  }

  /** STUB frame sampling: every `everyN`-th 64-byte block stands in for a
    * decoded video frame (a real impl seeks keyframes in the container). */
  def sampleFramesStub(r: MediaRecord, everyN: Int): Iterator[Frame] = {
    val blockSize = 64
    Iterator.from(0)
      .map(_ * everyN * blockSize)
      .takeWhile(_ < r.media.length)
      .zipWithIndex
      .map { case (off, idx) =>
        Frame(r.doc_id, idx, off.toLong,
          r.media.slice(off, math.min(off + blockSize, r.media.length)))
      }
  }

  /** Batch resize over the corpus: same mapPartitions shape as
    * [[extractFeatures]]. */
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[Thumbnail] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(resizeStub(_, w, h)))
  }

  /** Frame sampling is a flatMap — one media row fans out to many frames;
    * downstream repartitioning (not here) controls frame-batch sizing. */
  def sampleAllFrames(media: Dataset[MediaRecord], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(sampleFramesStub(_, everyN)))
  }

  /** Fixture adapter: documents.text bytes stand in for media payloads. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), lit("image/fake").as("media_type"),
      col("text").cast("binary").as("media")).as[MediaRecord]
  }

  /** Real ingestion path: a directory of raw media FILES → MediaRecord, via
    * Spark's built-in `binaryFile` source (how media actually lands in a
    * lakehouse before it has a table). doc_id is derived from the file name
    * (`<id>.<ext>`); media_type from the extension. The source is
    * scan-parallel, supports `pathGlobFilter`, and never materializes a
    * file on the driver — at 100 TB this is the bulk-ingest scan that
    * [[extractFeatures]] runs directly on top of. */
  def mediaFromBinaryFiles(spark: SparkSession, dir: String,
      glob: String = "*"): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.[^/.]+$", 1).cast("long").as("doc_id"),
        concat(lit("file/"), regexp_extract(col("path"), "\\.([^/.]+)$", 1)).as("media_type"),
        col("content").as("media"))
      .as[MediaRecord]
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
