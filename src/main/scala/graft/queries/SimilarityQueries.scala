package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Similarity-search extension queries (q55–q56) over `embeddings`:
  * exact brute-force cosine top-k, and the LSH-bucketed ANN variant
  * whose candidate set is a same-bucket equi-join (the 100 TB shape:
  * shuffle on the bucket key instead of a cross join).
  */
object SimilarityQueries {

  private val K = 10
  private val NumQueries = 5 // vec_id 0..4 act as the query set

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Dedup.norm(col("embedding")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact top-k: queries × corpus ranked by pinned-fold cosine.
    // Broadcast of the tiny query side keeps the corpus unshuffled.
    "q55_knn_bruteforce" -> ((s, dir) => {
      emb(s, dir).createOrReplaceTempView("emb_knn")
      s.sql(s"""
        |SELECT query_id, vec_id, cosine, rank FROM (
        |  SELECT query_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, vec_id ASC) AS rank
        |  FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |      graft_dot(q.embedding, c.embedding) / (q.nrm * c.nrm) AS cosine
        |    FROM emb_knn q JOIN emb_knn c ON q.vec_id < $NumQueries
        |      AND c.vec_id <> q.vec_id))
        |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)
    }),

    // LSH-bucketed ANN: same ranking but candidates restricted to the
    // query's hyperplane bucket (approximate — recall < 1 by design).
    "q56_ann_lsh" -> ((s, dir) => {
      emb(s, dir).withColumn("bucket", Similarity.bucket(col("embedding")))
        .createOrReplaceTempView("emb_lsh")
      s.sql(s"""
        |SELECT query_id, vec_id, bucket, cosine, rank FROM (
        |  SELECT query_id, vec_id, bucket, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, vec_id ASC) AS rank
        |  FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.bucket AS bucket,
        |      graft_dot(q.embedding, c.embedding) / (q.nrm * c.nrm) AS cosine
        |    FROM emb_lsh q JOIN emb_lsh c ON q.bucket = c.bucket
        |      AND q.vec_id < $NumQueries AND c.vec_id <> q.vec_id))
        |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)
    }))

  val oracleSql: Map[String, String] = {
    val dot = Dedup.dotProductSql("q.embedding", "c.embedding")
    Map(
      "q55_knn_bruteforce" ->
        s"""WITH e AS (SELECT vec_id, embedding, ${Dedup.normSql("embedding")} AS nrm FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
           |    $dot / (q.nrm * c.nrm) AS cosine
           |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
           |ranked AS (
           |  SELECT query_id, vec_id, cosine,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id, cosine, rank FROM ranked
           |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,

      "q56_ann_lsh" ->
        s"""WITH e AS (SELECT vec_id, embedding, ${Dedup.normSql("embedding")} AS nrm,
           |    ${Similarity.bucketSql("embedding")} AS bucket FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.bucket AS bucket,
           |    $dot / (q.nrm * c.nrm) AS cosine
           |  FROM e q JOIN e c ON q.bucket = c.bucket
           |    AND q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
           |ranked AS (
           |  SELECT query_id, vec_id, bucket, cosine,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id, bucket, cosine, rank FROM ranked
           |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)
  }
}
