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
