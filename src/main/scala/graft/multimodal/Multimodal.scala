package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (north star): media as opaque `binary`
  * columns with typed metadata, and a decode/feature-extract stage.
  *
  * The Spark-side plumbing is real: schema (binary content + kind),
  * partition-preserving typed mapPartitions with per-partition decoder
  * setup, and a stable feature schema. The decoder itself is a
  * DETERMINISTIC STUB (`FakeDecoder`) — image/audio codecs are not in
  * this container. On a real cluster the seam is one line: replace
  * FakeDecoder.decode with a JNI/codec call, or swap the whole
  * mapPartitions for a vectorized Python UDF (mapInArrow) feeding
  * PIL/ffmpeg — the batch shape, schema and partitioning stay identical.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, content: Array[Byte], kind: String)

  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      first_byte: Long, checksum: Long)

  /** STUB decoder — deterministic features computed from the raw bytes.
    * Stands in for image decode / resize / frame-sample. */
  object FakeDecoder {
    private val P = 1000000007L
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.content.length.toLong
      val first = if (n > 0) (r.content(0) & 0xff).toLong else -1L
      var sum = 0L
      var i = 0
      val lim = math.min(r.content.length, 256)
      while (i < lim) { sum = (sum + (r.content(i) & 0xff)) % P; i += 1 }
      MediaFeatures(r.doc_id, r.kind, n, first, sum)
    }
  }

  /** documents → media table: the text bytes stand in for a decoded-from-
    * storage blob. At 100 TB the binary column would come from a parquet/
    * lance scan or `binaryFile` source — same schema. */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
      lit("text").as("kind"))

  /** The decode stage: narrow (partition-preserving), no shuffle; decoder
    * state is initialized once per partition, not per row. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec init, model load)
        it.map(FakeDecoder.decode)
      }
      .toDF()
  }

  case class FrameFeature(doc_id: Long, frame_idx: Long, fsum: Long)

  /** Frame-sampling plumbing: split the binary into fixed 64-byte
    * "frames" (standing in for video frame boundaries) and emit one
    * feature row per frame — a narrow flatMap, the 1:N shape a real
    * frame sampler (ffmpeg keyframe walk) produces. The per-frame
    * feature is the byte sum mod 1e9+7 (deterministic stub for the
    * per-frame embed/resize step). */
  def frameFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val P = 1000000007L
    media.as[MediaRecord]
      .flatMap { r =>
        val n = r.content.length
        val nf = (n + 63) / 64
        (0 until nf).iterator.map { k =>
          var s = 0L
          var i = k * 64
          val lim = math.min(n, k * 64 + 64)
          while (i < lim) { s = (s + (r.content(i) & 0xff)) % P; i += 1 }
          FrameFeature(r.doc_id, k.toLong, s)
        }
      }
      .toDF()
  }
}
