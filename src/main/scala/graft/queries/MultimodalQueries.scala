package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal extension queries (q60–q62) over a media table synthesized
  * from `documents` (text bytes stand in for image/audio payloads — see
  * Multimodal's stub-codec note).
  *
  * q61's feature vectors come from the partition-wise stub codec
  * (mapPartitions, not SQL-expressible), but its dumped digest IS: the
  * stub fold is Σ bytes / 256 with every partial sum exact in float32
  * (StubCodec scaladoc), so the oracle re-renders the byte fold in
  * DuckDB via hex(encode(text)) and a list comprehension.
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.fromDocuments(Tables.load(s, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Binary payload + typed metadata projection.
    "q60_media_meta" -> ((s, dir) =>
      media(s, dir).select(
          col("media_id"),
          octet_length(col("content")).as("n_bytes"),
          md5(col("content")).as("content_md5"),
          col("meta.mime").as("mime"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("media_id")),

    // Partition-wise stub-codec feature extraction; digest oracled below.
    "q61_media_features" -> ((s, dir) => {
      import s.implicits._
      val ds = media(s, dir).as[Multimodal.MediaRow]
      Multimodal.extractFeatures(ds, dim = 8).toDF()
        .select(col("media_id"), col("n_bytes"),
          // deterministic scalar digest of the vector for a stable dump
          aggregate(col("features"), lit(0.0d),
            (acc, x) => acc + x.cast("double")).as("feature_sum"))
        .orderBy("media_id")
    }),

    // Metadata-driven frame sampling: one row per 100ms frame offset.
    "q62_frame_offsets" -> ((s, dir) =>
      Multimodal.frameOffsets(media(s, dir), everyMs = 100L)
        .select(col("media_id"), col("frame_ms"))
        .orderBy("media_id", "frame_ms")),

    // Stub RESIZE (the remaining codec-boundary op after decode /
    // features / frame-sample): nearest-neighbor downsample of the raw
    // payload to 16 "pixels" — pixel i = byte at (i·len) div 16, exact
    // integer index arithmetic. A real image codec would resample
    // decoded planes; the Spark-side shape (per-row expressions over
    // binary, no shuffle) is identical. Both engines read bytes from
    // the hex rendering two chars at a time, so codes hash-compare.
    "q84_media_resize" -> ((s, dir) => {
      val px = 16
      val len = octet_length(col("content"))
      val hx = hex(col("content"))
      // (i·len)/16 stays exact in double (ints ≪ 2^53), so floor ≡ the
      // oracle's integer division
      val pixels = transform(sequence(lit(0), lit(px - 1)), i =>
        conv(hx.substr(
          (floor((i * len) / lit(px.toDouble)).cast("int") * 2 + 1), lit(2)), 16, 10)
          .cast("long"))
      media(s, dir)
        .where(octet_length(col("content")) > 0)
        .withColumn("pixels", pixels)
        .select(col("media_id"), len.as("n_bytes"),
          aggregate(col("pixels"), lit(0L), (a, x) => a + x).as("pixel_sum"),
          concat_ws("|", col("pixels").cast("array<string>")).as("pixels_str"))
        .orderBy("media_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "q60_media_meta" ->
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_md5, 'text/plain' AS mime,
        |  CAST(len(text) AS BIGINT) * 10 AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,

    // The stub byte fold, re-expressed: per-slot float32 sums are exact
    // multiples of 2⁻⁸ (StubCodec scaladoc), so feature_sum ≡ Σ bytes/256
    // with one exact double division — engine-portable. Bytes are read
    // from hex(encode(text)) two chars at a time.
    //
    // HARD PRECONDITION: exactness holds only while each slot's byte sum
    // stays < 2²⁴ (float32 integer range), i.e. payloads ≲ 0.5 MB at
    // dim = 8. The fixture documents are well under that; a real codec
    // replacing the stub must either keep payloads bounded or accumulate
    // in double before this oracle is trusted.
    "q61_media_features" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(coalesce(list_sum(
        |    [CAST('0x' || substr(hex(encode(text)), 2*i - 1, 2) AS INT)
        |     for i in range(1, octet_length(encode(text)) + 1)]), 0) AS DOUBLE)
        |    / 256.0 AS feature_sum
        |FROM documents ORDER BY media_id""".stripMargin,

    "q62_frame_offsets" ->
      """SELECT doc_id AS media_id, unnest(range(0, CAST(len(text) AS BIGINT) * 10 + 1, 100)) AS frame_ms
        |FROM documents ORDER BY media_id, frame_ms""".stripMargin,

    "q84_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |    hex(encode(text)) AS hx
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        |p AS (
        |  SELECT media_id, n_bytes,
        |    [CAST('0x' || substr(hx, ((i * n_bytes) // 16) * 2 + 1, 2) AS BIGINT)
        |     for i in range(0, 16)] AS pixels
        |  FROM m)
        |SELECT media_id, n_bytes,
        |  list_reduce(list_concat([CAST(0 AS BIGINT)], pixels), (a, x) -> a + x) AS pixel_sum,
        |  array_to_string(pixels, '|') AS pixels_str
        |FROM p ORDER BY media_id""".stripMargin)
}
