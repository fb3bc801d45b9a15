package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.KMeans
import graft.sources.Tables

/** Embedding-clustering extension queries (q98): deterministic integer
  * k-means over the `embeddings` fixture — the clustering step behind
  * semantic-dedup cluster pruning and data-mixing domain discovery.
  * See [[graft.operators.KMeans]] for the exact-arithmetic design that
  * makes a two-engine differential oracle possible for an ITERATIVE
  * algorithm: every Lloyd iteration is exact integer arithmetic, so
  * the DuckDB rendering (the same iterations unrolled as CTEs) must
  * agree bit-for-bit or the hash gate fails.
  */
object ClusteringQueries {

  private val K = 8
  private val Iters = 2
  /** Fixture embedding dimensionality — used by the ORACLE rendering
    * only (the Spark side reads the array length per row). */
  private val Dim = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // K-means corpus clustering: assignment + exact int64 squared-L2
    // distance under the final centroids, plus final cluster sizes.
    // Scale shape: per-iteration cost is one embarrassingly parallel
    // assignment scan (centroids broadcast as literals — no join, no
    // shuffle) plus a (cluster, dim) partial-aggregated sum whose
    // shuffle is constant-size; the size join back is a broadcast of
    // k rows.
    "q98_kmeans" -> ((s, dir) => {
      val fitted = KMeans.fit(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", k = K, iters = Iters)
      val sizes = fitted.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
      fitted.join(broadcast(sizes), "cluster")
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          col("dist"), col("n_members"))
        .orderBy("vec_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "q98_kmeans" -> {
      val qv = KMeans.quantizeSql("embedding")
      def dist(a: String, b: String) = KMeans.sqDistSql(a, b, Dim)
      // One (score → assign → sum → update) block per Lloyd iteration,
      // unrolled; floor division is (s - ((s%n)+n)%n)/n — exact on the
      // exact multiple, matching Math.floorDiv.
      def step(i: Int, prev: String): String =
        s"""s$i AS (SELECT q.vec_id, $prev.cid, ${dist("q.qv", s"$prev.cv")} AS d,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${dist("q.qv", s"$prev.cv")}, $prev.cid) AS rk
           |  FROM q CROSS JOIN $prev),
           |a$i AS (SELECT vec_id, cid FROM s$i WHERE rk = 1),
           |m$i AS (SELECT a$i.cid, t.i AS pos, sum(q.qv[t.i]) AS s, count(*) AS n
           |  FROM a$i JOIN q USING (vec_id)
           |  CROSS JOIN (SELECT unnest(range(1, $Dim + 1)) AS i) t
           |  GROUP BY 1, 2),
           |u$i AS (SELECT cid, list(CAST((s - ((s % n) + n) % n) / n AS BIGINT) ORDER BY pos) AS cv
           |  FROM m$i GROUP BY cid),
           |c$i AS (SELECT $prev.cid, coalesce(u$i.cv, $prev.cv) AS cv
           |  FROM $prev LEFT JOIN u$i USING (cid))""".stripMargin
      val steps = (1 to Iters).map(i => step(i, s"c${i - 1}")).mkString(",\n")
      s"""WITH q AS (SELECT vec_id, $qv AS qv FROM embeddings),
         |seeds AS (SELECT vec_id,
         |    row_number() OVER (ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
         |  FROM embeddings),
         |c0 AS (SELECT cid, qv AS cv FROM seeds JOIN q USING (vec_id) WHERE cid < $K),
         |$steps,
         |sf AS (SELECT q.vec_id, c$Iters.cid, ${dist("q.qv", s"c$Iters.cv")} AS d,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${dist("q.qv", s"c$Iters.cv")}, c$Iters.cid) AS rk
         |  FROM q CROSS JOIN c$Iters)
         |SELECT vec_id, cid AS cluster, d AS dist,
         |  count(*) OVER (PARTITION BY cid) AS n_members
         |FROM sf WHERE rk = 1 ORDER BY vec_id""".stripMargin
    })
}
