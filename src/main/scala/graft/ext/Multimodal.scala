package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque payload bytes + typed metadata. */
final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], source: String)

/** Features extracted from one asset by the (stubbed) decoder. */
final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                               width: Long, height: Long, format: String)

/** Multimodal column handling: images/audio/video modeled as opaque
  * `BINARY` columns with typed metadata, processed by partition-wise
  * decoders.
  *
  * The Spark-side plumbing is real and tested: schema, typed Dataset,
  * partition-batched iteration (one decoder init per partition, the shape
  * a libjpeg/ffmpeg binding needs), and deterministic output. The decode
  * itself is STUBBED — this container has no image/audio codecs — with a
  * deterministic fake: features derived arithmetically from the payload
  * bytes, so the pipeline stays oracle-checkable end-to-end.
  */
object Multimodal {

  /** Derive a media table from the documents table: the UTF-8 bytes of
    * `text` stand in for an encoded image payload. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))

  /** STUB decoder — deterministic fake of an image header parse.
    * A real build replaces the body with the codec call; the signature,
    * batching, and schema stay as-is. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      n_bytes = n,
      width = n % 640 + 1,
      height = (n * 7) % 480 + 1,
      // unsigned byte compare, matching the oracle's binary-collation
      // substr(text,1,1) < 'n' (UTF-8 lead bytes >= 0x80 sort AFTER 'n';
      // empty text sorts before)
      format = if (r.payload.isEmpty || (r.payload(0) & 0xFF) < 'n'.toInt) "png" else "jpeg")
  }

  /** Partition-wise decode: one decoder context per partition, streamed
    * over the rows (never materializes a partition in memory). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      // real decoders initialize native context here, once per partition
      rows.map(decodeStub)
    }
  }

  /** Resize plan for decoded assets: clamp the longer edge to `maxDim`
    * preserving aspect ratio (integer arithmetic — the real resampler is
    * the stubbed codec; the geometry planning and schema are the real
    * pipeline surface). */
  def resizePlan(features: DataFrame, maxDim: Int = 256): DataFrame = {
    val longEdge = greatest(col("width"), col("height"))
    val needs = longEdge > maxDim
    features.select(
        col("media_id"), col("width"), col("height"),
        when(needs, floor(col("width") * maxDim / longEdge).cast("long"))
          .otherwise(col("width")).as("new_width"),
        when(needs, floor(col("height") * maxDim / longEdge).cast("long"))
          .otherwise(col("height")).as("new_height"),
        needs.as("resized"))
      .orderBy("media_id")
  }

  /** Deterministic frame sampling stub for video-kind assets: pick every
    * `stride`-th byte offset as a "frame" index — exercises the explode
    * shape (1 asset row -> n frame rows) a real sampler produces. */
  def sampleFrames(media: DataFrame, stride: Int = 100): DataFrame =
    media.select(col("media_id"),
        explode(when(length(col("payload")) > 0,
            sequence(lit(0L), length(col("payload")).cast("long") - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<bigint>")))
          .as("frame_offset"))
      .orderBy("media_id", "frame_offset")

  /** End-to-end features query (sorted, oracle-checkable). */
  def featuresQuery(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(asMediaTable(docs)).toDF().orderBy("media_id")

  /** Exact duplicate media by payload digest: one row per distinct BYTE
    * content, keeping the smallest media_id as representative with the
    * copy count — byte-identical re-crawls/re-uploads, the dominant
    * duplicate class for binary assets.
    *
    * Scale design: the shuffle carries only (sha256, id) — the payload
    * bytes themselves never cross the wire, so this works unchanged when
    * payloads are multi-MB images or video segments. */
  def exactPayloadDedup(media: DataFrame): DataFrame =
    media.groupBy(sha2(col("payload"), 256).as("payload_sha"))
      .agg(min(col("media_id")).as("media_id"), count(lit(1)).as("n_copies"))
      .select("media_id", "payload_sha", "n_copies")
      .orderBy("media_id")
}
