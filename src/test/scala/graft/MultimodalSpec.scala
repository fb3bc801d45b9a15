package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** Multimodal plumbing specs: schema, stub-codec determinism,
  * partition-wise execution, frame sampling. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    MediaRow(1L, "hello".getBytes("UTF-8"), MediaMeta("text/plain", 0, 0, 300L)),
    MediaRow(2L, Array[Byte](0, 1, 2, 3), MediaMeta("application/octet-stream", 0, 0, 100L)),
    MediaRow(3L, null, MediaMeta("text/plain", 0, 0, 0L)))

  test("extractFeatures is deterministic and handles null payloads") {
    val ds = rows.toDS()
    val a = Multimodal.extractFeatures(ds, dim = 4).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(ds, dim = 4).collect().sortBy(_.media_id)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a.map(_.n_bytes).toSeq == Seq(5, 4, 0))
    assert(a(2).features.toSeq == Seq(0f, 0f, 0f, 0f))
    // stub decode definition: byte i adds (b & 0xff)/256 to slot i % dim
    val expected0 = "hello".getBytes("UTF-8").zipWithIndex
      .foldLeft(new Array[Float](4)) { case (acc, (by, i)) =>
        acc(i % 4) += (by & 0xff).toFloat / 256f; acc }
    assert(a(0).features.toSeq == expected0.toSeq)
  }

  test("feature extraction preserves partitioning (one codec per partition)") {
    val ds = rows.toDS().repartition(3)
    val out = Multimodal.extractFeatures(ds, dim = 2)
    assert(out.rdd.getNumPartitions == 3)
    assert(out.count() == 3)
  }

  test("real ImageCodec decodes a PNG through the partition-wise interface") {
    // synthesize a real 16×16 PNG: left half black, right half white
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray

    val ds = Seq(
      MediaRow(1L, png, MediaMeta("image/png", 16, 16, 0L)),
      MediaRow(2L, "not an image".getBytes("UTF-8"), MediaMeta("image/png", 0, 0, 0L))).toDS()
    val out = Multimodal.extractFeatures(ds, dim = 4, codecFor = new Multimodal.ImageCodec(_))
      .collect().sortBy(_.media_id)
    // half the pixels are luma 0 (bucket 0), half luma 255 (bucket 3)
    assert(out(0).features.toSeq == Seq(0.5f, 0f, 0f, 0.5f))
    assert(out(0).n_bytes == png.length)
    // undecodable payload → zero vector, not a partition-killing throw
    assert(out(1).features.toSeq == Seq(0f, 0f, 0f, 0f))
  }

  test("real AudioCodec decodes a WAV through the partition-wise interface") {
    // synthesize a real WAV: 800 samples 16-bit mono PCM — first half
    // silence, second half a full-scale square wave (RMS ≈ 1)
    val samples = Array.tabulate[Short](800)(i =>
      if (i < 400) 0 else if (i % 2 == 0) 32767 else -32767)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) { // little-endian
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val ds = Seq(MediaRow(1L, wav, MediaMeta("audio/wav", 0, 0, 100L))).toDS()
    val out = Multimodal.extractFeatures(ds, dim = 2, codecFor = new Multimodal.AudioCodec(_))
      .collect()
    val Array(rmsLo, rmsHi) = out(0).features
    assert(rmsLo == 0f, s"silent half should be 0, got $rmsLo")
    assert(math.abs(rmsHi - 1f) < 0.01, s"square-wave half should be ~1, got $rmsHi")
  }

  test("frameOffsets explodes inclusive 0..duration_ms by step") {
    val df = Multimodal.frameOffsets(rows.toDS().toDF(), everyMs = 100L)
      .groupBy("media_id").agg(count(lit(1)).as("n"), max("frame_ms").as("mx"))
      .orderBy("media_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(df == Seq((1L, 4L, 300L), (2L, 2L, 100L), (3L, 1L, 0L)))
  }

  test("fromDocuments round-trips text bytes into the media schema") {
    val docs = Seq((7L, "abc")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", lit(3L))
    val m = Multimodal.fromDocuments(docs)
    val r = m.select(col("media_id"), octet_length(col("content")).as("n"),
      col("meta.duration_ms")).as[(Long, Int, Long)].head()
    assert(r == ((7L, 3, 30L)))
  }
}
