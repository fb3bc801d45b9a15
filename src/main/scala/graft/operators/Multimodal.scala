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
  * The codec boundary is PLUGGABLE ([[Multimodal.MediaCodec]]):
  * `StubCodec` (the default) derives a deterministic byte-fold feature
  * vector so the declared queries stay exactly oracle-able, while
  * `ImageCodec` / `AudioCodec` decode real PNG/WAV payloads through the
  * JDK's bundled `javax.imageio` / `javax.sound.sampled` stacks —
  * same schema, same partition-wise interface, swapped per call
  * (MultimodalSpec exercises both on synthesized fixtures). Everything
  * around the codec — schema, encoders, partitioning, per-partition
  * batching, frame-offset sampling — is shared Spark plumbing.
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

  /** The pluggable codec boundary: bytes → fixed-dim feature vector.
    * Implementations must be constructible ON THE EXECUTOR (inside
    * mapPartitions) — construction stands for the expensive init a real
    * deployment amortizes per partition (JNI handles, model weights). */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** STUB codec (the default): a deterministic byte-derived fake so
    * tests and plumbing are exact without any codec library.
    *
    * The scale is 1/256 (not 1/255) deliberately: byte/256 = byte·2⁻⁸ and
    * every partial sum k·2⁻⁸ (k < 2²⁴ for any realistic payload) is
    * exactly representable in float32, so accumulation order is
    * irrelevant and the q61 digest can be differentially verified
    * against a DuckDB SQL rendering of the same byte fold. */
  final class StubCodec(dim: Int) extends MediaCodec {
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

  /** REAL image codec over the JDK's bundled decoders
    * (`javax.imageio`: PNG/JPEG/BMP/GIF). Feature = dim-bucket
    * luminance histogram, normalized by pixel count — deterministic for
    * a given payload, so it stays differential-test-friendly.
    * Undecodable/empty payloads yield the zero vector (the quarantine
    * convention: never throw mid-partition over one bad file). */
  final class ImageCodec(dim: Int) extends MediaCodec {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes == null || bytes.isEmpty) return out
      // NonFatal, not just IOException: JDK decoders throw runtime
      // exceptions on corrupt-but-recognized payloads (bogus chunk
      // dimensions etc.), and one bad file must not kill the partition
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return out
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          // integer Rec.601 luma: deterministic across platforms
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          out(lum * dim / 256) += 1f
          x += 1
        }
        y += 1
      }
      val n = (img.getWidth.toLong * img.getHeight).toFloat
      var i = 0
      while (i < dim) { out(i) /= n; i += 1 }
      out
    }
  }

  /** REAL audio codec over the JDK's sampled-audio stack
    * (`javax.sound.sampled.AudioSystem`: WAV/AIFF PCM). Feature =
    * per-slice RMS energy over dim equal time slices of the 16-bit PCM
    * stream. Undecodable payloads yield the zero vector. */
  final class AudioCodec(dim: Int) extends MediaCodec {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes == null || bytes.isEmpty) return out
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (in == null) return out
      // same NonFatal quarantine as ImageCodec: a corrupt PCM body must
      // yield the zero vector, not abort the partition
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return out
        val data = in.readAllBytes()
        val n = data.length / 2
        if (n == 0) return out
        val cnt = new Array[Int](dim)
        var i = 0
        while (i < n) {
          val s: Short =
            if (fmt.isBigEndian) (((data(2 * i) & 0xff) << 8) | (data(2 * i + 1) & 0xff)).toShort
            else (((data(2 * i + 1) & 0xff) << 8) | (data(2 * i) & 0xff)).toShort
          val b = (i.toLong * dim / n).toInt
          val v = s.toFloat / 32768f
          out(b) += v * v
          cnt(b) += 1
          i += 1
        }
        var j = 0
        while (j < dim) {
          if (cnt(j) > 0) out(j) = math.sqrt((out(j) / cnt(j)).toDouble).toFloat
          j += 1
        }
        out
      } catch {
        case scala.util.control.NonFatal(_) =>
          java.util.Arrays.fill(out, 0f)
          out
      } finally in.close()
    }
  }

  /** Partition-wise feature extraction: ONE codec per partition, rows
    * streamed through it — the scalable shape for 100 TB of media
    * (repartition upstream to bound partition payload size; binary
    * columns make input splits follow parquet row groups).
    *
    * `codecFor` picks the implementation (default: the exact-oracle
    * stub); it is invoked INSIDE mapPartitions, so codec init runs on
    * the executor, once per partition. */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 8,
                      codecFor: Int => MediaCodec = new StubCodec(_)): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val codec = codecFor(dim) // amortized init
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
