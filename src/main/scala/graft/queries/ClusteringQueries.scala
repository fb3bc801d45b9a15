package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{KMeans, TopK}
import graft.sources.Tables

/** Embedding-clustering extension queries (q98, q100): deterministic
  * integer k-means over the `embeddings` fixture — the clustering step
  * behind semantic-dedup cluster pruning and data-mixing domain
  * discovery — and the cluster-balanced sampling manifest built on it.
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
  /** q100: total sample budget spread over clusters ∝ size^0.5. */
  private val SampleTotal = 60
  /** q111: squared-L2 near-dup radius in the quantized (·2^20) space —
    * sits between the fixture's global 0.1 % and 1 % pair-distance
    * percentiles at every SF (measured: min pair ≈ 1.07e12, p1 ≈
    * 1.56e12), so intra-cluster neighborhoods are nontrivial without
    * flooding the output. */
  private val Theta = 1450000000000L

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
    }),

    // Cluster-balanced sampling — the data-mixing manifest over the
    // k-means domains (published recipe: cluster embeddings, then
    // sample per cluster with a temperature-rebalanced budget so small
    // clusters aren't drowned out). Composes the repo's determinism
    // techniques end-to-end: q98's exact-integer clusters, q97's
    // correctly-rounded sqrt + explicit-order normalizer fold (never a
    // partition-order float SUM), and q85's content-addressed
    // priorities (never rand()); the budget is floor((T·w)/Z) — two
    // IEEE ops in pinned order, engine-identical. Scale shape: sizes
    // and budgets are k-row aggregates (broadcast), per-cluster
    // selection streams through the custom TopKPerKey operator (k =
    // total budget bound), and the budget filter is a broadcast join.
    "q100_cluster_sample" -> ((s, dir) => {
      val fitted = KMeans.fit(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", k = K, iters = Iters)
      fitted.groupBy("cluster").agg(count(lit(1)).as("n_members"))
        .withColumn("wt", sqrt(col("n_members").cast("double")))
        .createOrReplaceTempView("cs_sizes")
      val budgets = s.sql(s"""
        |WITH z AS (
        |  SELECT aggregate(array_sort(collect_list(struct(cluster, wt))),
        |    CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.wt) AS z
        |  FROM cs_sizes)
        |SELECT /*+ BROADCAST(z) */ cluster, n_members,
        |  CAST(floor(($SampleTotal * wt) / z) AS BIGINT) AS budget
        |FROM cs_sizes CROSS JOIN z""".stripMargin)
      val pri = fitted.withColumn("u",
        conv(substring(md5(concat(lit("cs:"), col("vec_id").cast("string"))), 1, 12),
          16, 10).cast("long"))
      TopK.perKey(pri, Seq("cluster"),
          Seq("u" -> true, "vec_id" -> true), k = SampleTotal)
        .join(broadcast(budgets), "cluster")
        .where(col("rank") <= col("budget"))
        .select(col("cluster").cast("long").as("cluster"), col("vec_id"),
          col("n_members"), col("budget"), col("rank"))
        .orderBy("cluster", "rank")
    }),

    // Cluster-blocked semantic near-dup — the SemDeDup blocking
    // structure (cluster the embedding space, then compare only within
    // clusters), complementing the LSH-bucketed q54/q89 path: LSH
    // blocks by random hyperplanes and pays a recall tail; this blocks
    // by the learned k-means partition, so within-cluster recall is
    // exact. One row per vector: cluster, in-cluster neighbor count
    // within the exact-int64 Theta ball, and the surviving
    // representative min(self ∪ neighbors). Engine + 100 TB analysis
    // in KMeans.nearDup's scaladoc.
    "q111_cluster_semantic_dedup" -> ((s, dir) =>
      KMeans.nearDup(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = K, iters = Iters, theta = Theta)
        .orderBy("vec_id")))

  /** The k-means Lloyd chain as DuckDB CTEs, ending in `sf` (vec_id ×
    * centroid scored, rk = 1 is the final assignment). Shared by the
    * q98 and q100 oracles. */
  private def kmeansOracleCtes: String = {
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
       |  FROM q CROSS JOIN c$Iters)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q98_kmeans" ->
      s"""$kmeansOracleCtes
         |SELECT vec_id, cid AS cluster, d AS dist,
         |  count(*) OVER (PARTITION BY cid) AS n_members
         |FROM sf WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    // q100: the same pinned-order float discipline as the q97 oracle —
    // sqrt is correctly rounded, the normalizer is an explicit
    // cluster-order list fold, the budget is floor((T·w)/Z) with the
    // identical association order as the Spark side.
    "q100_cluster_sample" ->
      s"""$kmeansOracleCtes,
         |asg AS (SELECT vec_id, cid AS cluster FROM sf WHERE rk = 1),
         |sizes AS (SELECT cluster, count(*) AS n_members,
         |    sqrt(CAST(count(*) AS DOUBLE)) AS wt
         |  FROM asg GROUP BY cluster),
         |z AS (SELECT list_reduce(
         |    list_concat([CAST(0 AS DOUBLE)], list(wt ORDER BY cluster)),
         |    (acc, x) -> acc + x) AS z FROM sizes),
         |b AS (SELECT cluster, n_members,
         |    CAST(floor(($SampleTotal * wt) / z.z) AS BIGINT) AS budget
         |  FROM sizes CROSS JOIN z),
         |pri AS (SELECT asg.vec_id, asg.cluster,
         |    CAST('0x' || substr(md5('cs:' || CAST(vec_id AS VARCHAR)), 1, 12) AS BIGINT) AS u
         |  FROM asg),
         |ranked AS (SELECT vec_id, cluster,
         |    row_number() OVER (PARTITION BY cluster ORDER BY u, vec_id) AS rank
         |  FROM pri)
         |SELECT ranked.cluster, vec_id, b.n_members, b.budget, rank
         |FROM ranked JOIN b USING (cluster)
         |WHERE rank <= b.budget
         |ORDER BY cluster, rank""".stripMargin,

    // q111: the Lloyd chain's final assignment, capped per cluster
    // exactly as Dedup.capBuckets does (row_number over vec_id), then
    // the within-cluster pair filter under the identical exact-int64
    // squared-L2 — the cap and the distance are both mirrored, so the
    // contract is two-sided. mcap is AS MATERIALIZED: it feeds both
    // sides of the self-join, and DuckDB's default inlining would
    // re-derive the whole k-means chain per reference.
    "q111_cluster_semantic_dedup" ->
      s"""$kmeansOracleCtes,
         |casg AS MATERIALIZED (SELECT vec_id, cid AS cluster FROM sf WHERE rk = 1),
         |mcap AS MATERIALIZED (SELECT vec_id, cluster, qv FROM (
         |  SELECT a.vec_id, a.cluster, q.qv,
         |    row_number() OVER (PARTITION BY a.cluster ORDER BY a.vec_id) AS crk
         |  FROM casg a JOIN q USING (vec_id)) WHERE crk <= ${graft.operators.Dedup.MaxBucket}),
         |nbr AS (SELECT a.vec_id, count(*) AS n_near, min(b.vec_id) AS mn
         |  FROM mcap a JOIN mcap b ON b.cluster = a.cluster AND b.vec_id <> a.vec_id
         |  WHERE ${KMeans.sqDistSql("a.qv", "b.qv", Dim)} <= $Theta
         |  GROUP BY 1)
         |SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
         |  coalesce(n.n_near, CAST(0 AS BIGINT)) AS n_near,
         |  least(coalesce(n.mn, a.vec_id), a.vec_id) AS keep_vec_id
         |FROM casg a LEFT JOIN nbr n ON n.vec_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin)
}
