package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder-prompt extension surface): treat
  * image/audio/video payloads as opaque `binary` columns with a typed
  * metadata struct, and run decode / feature-extraction per-partition so
  * a real codec's init cost (JNI handle, model weights, ffmpeg context)
  * is amortized across a partition — the Scala equivalent of the
  * arrow-batched Pandas-UDF pattern.
  *
  * The DECODE STEP IS A STUB: this container ships no image/audio codec
  * libraries, so `StubCodec` derives a deterministic fake feature vector
  * from the raw bytes (documented below). Everything around it — schema,
  * encoders, partitioning, per-partition batching, frame-offset
  * sampling — is real, tested Spark plumbing; swapping in a real codec
  * changes only `StubCodec.decode`.
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, duration_ms: Long)
  case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, n_bytes: Int, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** STUB for the codec boundary. A real implementation would decode
    * `content` with an image/audio library; here features are a
    * deterministic byte-derived fake so tests and plumbing are exact.
    *
    * The scale is 1/256 (not 1/255) deliberately: byte/256 = byte·2⁻⁸ and
    * every partial sum k·2⁻⁸ (k < 2²⁴ for any realistic payload) is
    * exactly representable in float32, so accumulation order is
    * irrelevant and the q61 digest can be differentially verified
    * against a DuckDB SQL rendering of the same byte fold. */
  final class StubCodec(dim: Int) {
    // stands in for expensive codec/model initialization
    private val initialized = true

    def decode(bytes: Array[Byte]): Array[Float] = {
      require(initialized)
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff).toFloat / 256f
        i += 1
      }
      out
    }
  }

  /** Partition-wise feature extraction: ONE codec per partition, rows
    * streamed through it — the scalable shape for 100 TB of media
    * (repartition upstream to bound partition payload size; binary
    * columns make input splits follow parquet row groups). */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val codec = new StubCodec(dim) // amortized init
      rows.map { r =>
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        MediaFeatures(r.media_id, bytes.length, codec.decode(bytes))
      }
    }
  }

  /** Frame-sample offsets from metadata alone (no decode): one row per
    * sampled frame timestamp — pure Column expressions, codegen'd. */
  def frameOffsets(df: DataFrame, everyMs: Long): DataFrame =
    df.select(col("media_id"), col("meta"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs)))
          .as("frame_ms"))

  /** Synthesize a media table from `documents` (text bytes as payload) —
    * the fixture stand-in for real binary media. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("text/plain").as("mime"),
        lit(0).as("width"), lit(0).as("height"),
        (length(col("text")).cast("long") * 10L).as("duration_ms")).as("meta"))
}
