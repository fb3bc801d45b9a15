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
  /** IVF cell count — a recall/cost parameter, not a structural limit:
    * assignment cost is NumCells·n dots either way, and a production
    * deployment grows it ~sqrt(n) to keep cells small. 8 suits the
    * 2k-vector fixture. */
  private val NumCells = 8

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
    }),

    // Multi-probe LSH: same bucket structure as q56, but each query also
    // probes the 8 buckets at Hamming distance 1 (bucket XOR each bit) —
    // the standard recall-vs-cost lever when a neighbor lands across a
    // hyperplane. Probes explode 9× on the tiny query side only; the
    // corpus is still touched through one bucket equi-join.
    "q66_ann_multiprobe" -> ((s, dir) => {
      emb(s, dir).withColumn("bucket", Similarity.bucket(col("embedding")))
        .createOrReplaceTempView("emb_mp")
      val xors = (Seq("bucket") ++ (0 until Similarity.NumPlanes)
        .map(i => s"bucket ^ ${1 << i}")).mkString("array(", ", ", ")")
      s.sql(s"""
        |WITH probes AS (
        |  SELECT vec_id, embedding, nrm, explode($xors) AS probe
        |  FROM emb_mp WHERE vec_id < $NumQueries),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.bucket AS bucket,
        |    graft_dot(q.embedding, c.embedding) / (q.nrm * c.nrm) AS cosine
        |  FROM probes q JOIN emb_mp c ON c.bucket = q.probe
        |    AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT query_id, vec_id, bucket, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, vec_id, bucket, cosine, rank FROM ranked
        |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)
    }),

    // IVF-style ANN: "train" 8 centroids (deterministically: the first 8
    // vectors), assign every vector to its nearest centroid cell, search
    // only the query's cell. Assignment is a broadcast cross join against
    // 8 centroids (8·n dots); search is a cell equi-join — at 100 TB
    // both stay shuffle-light, and more cells + multi-probe trade recall
    // for cost.
    "q57_ann_ivf" -> ((s, dir) => {
      emb(s, dir).createOrReplaceTempView("emb_ivf")
      s.sql(s"""
        |WITH cent AS (
        |  SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm
        |  FROM emb_ivf WHERE vec_id < $NumCells),
        |asg AS (
        |  SELECT v.vec_id, cid,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY graft_dot(v.embedding, cemb) / (v.nrm * cnrm) DESC, cid ASC) AS rk
        |  FROM emb_ivf v CROSS JOIN cent),
        |cells AS (SELECT vec_id, cid AS cell FROM asg WHERE rk = 1),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, cq.cell AS cell,
        |    graft_dot(q.embedding, c.embedding) / (q.nrm * c.nrm) AS cosine
        |  FROM emb_ivf q
        |  JOIN cells cq ON cq.vec_id = q.vec_id AND q.vec_id < $NumQueries
        |  JOIN cells cc ON cc.cell = cq.cell
        |  JOIN emb_ivf c ON c.vec_id = cc.vec_id AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cell, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, vec_id, cell, cosine, rank FROM ranked
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
           |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,

      "q66_ann_multiprobe" -> {
        val probesList = (Seq("bucket") ++ (0 until Similarity.NumPlanes)
          .map(i => s"xor(bucket, ${1 << i})")).mkString("[", ", ", "]")
        s"""WITH e AS (SELECT vec_id, embedding, ${Dedup.normSql("embedding")} AS nrm,
           |    ${Similarity.bucketSql("embedding")} AS bucket FROM embeddings),
           |probes AS (
           |  SELECT vec_id, embedding, nrm, unnest($probesList) AS probe
           |  FROM e WHERE vec_id < $NumQueries),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.bucket AS bucket,
           |    $dot / (q.nrm * c.nrm) AS cosine
           |  FROM probes q JOIN e c ON c.bucket = q.probe AND c.vec_id <> q.vec_id),
           |ranked AS (
           |  SELECT query_id, vec_id, bucket, cosine,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id, bucket, cosine, rank FROM ranked
           |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
      },

      "q57_ann_ivf" -> {
        val cdot = Dedup.dotProductSql("v.embedding", "cemb")
        s"""WITH e AS (SELECT vec_id, embedding, ${Dedup.normSql("embedding")} AS nrm FROM embeddings),
           |cent AS (SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm FROM e WHERE vec_id < $NumCells),
           |asg AS (
           |  SELECT v.vec_id, cid,
           |    row_number() OVER (PARTITION BY v.vec_id
           |      ORDER BY $cdot / (v.nrm * cnrm) DESC, cid ASC) AS rk
           |  FROM e v CROSS JOIN cent),
           |cells AS (SELECT vec_id, cid AS cell FROM asg WHERE rk = 1),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, cq.cell AS cell,
           |    $dot / (q.nrm * c.nrm) AS cosine
           |  FROM e q
           |  JOIN cells cq ON cq.vec_id = q.vec_id AND q.vec_id < $NumQueries
           |  JOIN cells cc ON cc.cell = cq.cell
           |  JOIN e c ON c.vec_id = cc.vec_id AND c.vec_id <> q.vec_id),
           |ranked AS (
           |  SELECT query_id, vec_id, cell, cosine,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id, cell, cosine, rank FROM ranked
           |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
      })
  }
}
