package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance — the "distance to a trusted seed
  * set" signal (link-quality curation ranks pages by hop distance from
  * a whitelist/seed frontier; this is that operator over an arbitrary
  * undirected edge list).
  *
  * Pure integer min-plus iteration, so Spark and the unrolled DuckDB
  * CTE oracle agree bit-for-bit:
  *
  *  - dist₀(v) = 0 for seeds, `Inf` (2^30, far above any real hop
  *    count, far below overflow under +1) otherwise — a sentinel, not
  *    NULL, so no engine-specific null-in-least semantics enter.
  *  - one round: dist'(v) = min(dist(v), 1 + min_{u→v, dist(u)<Inf}
  *    dist(u)); after k rounds dist is exact for every node within k
  *    hops of a seed and `Inf` beyond (the GraphFrames
  *    shortestPaths/maxIter contract).
  *
  * Scale shape (same Pregel-relational pattern as [[PageRank]]):
  *  - adjacency built once, repartitioned by `src`, persisted; every
  *    round's message join reuses the co-location.
  *  - per round ONE shuffle moves data: messages aggregate min by
  *    `dst` with map-side combine; the reached-frontier filter
  *    (`dist < Inf`) keeps the message volume at reached nodes only.
  *  - each round's |nodes|-row distance frame is `localCheckpoint`ed
  *    (the [[Components]] loop discipline): the carry-forward `least`
  *    references it ALONGSIDE the message join, so an untruncated
  *    chain doubles the logical plan every round — 2^k subtrees that
  *    OOM the driver on plan stringification long before execution
  *    (observed at 14 rounds). Checkpointing is the relational
  *    equivalent of Pregel's materialized per-superstep vertex state:
  *    plan size and per-round work stay constant in k.
  */
object Bfs {

  /** Unreached sentinel: 2^30 (min-plus safe: Inf + 1 cannot overflow
    * and never beats a real distance). */
  val Inf = 1L << 30

  /** Hop distances after `iters` rounds over the UNDIRECTED graph
    * `edges` (src, dst) from `seeds` (single column `node`). Returns
    * (node, dist) for every node in the edge list; unreached nodes
    * carry dist = [[Inf]]. */
  def run(edges: DataFrame, seeds: DataFrame, iters: Int,
          parts: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val bp = if (parts > 0) parts
      else LoopSizing.partitions(edges.sparkSession, 2L * edges.count())
    val adj = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(bp, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = adj.select(col("src").as("node")).distinct()
    val d0 = nodes
      .join(broadcast(seeds.select(col("node")).distinct()
        .withColumn("zero", lit(0L))), Seq("node"), "left")
      .select(col("node"), coalesce(col("zero"), lit(Inf)).as("dist"))
      .localCheckpoint()
    (1 to iters).foldLeft(d0) { (d, i) =>
      val msgs = adj
        .join(d.where(col("dist") < Inf).withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg((min(col("dist")) + 1L).as("md"))
      val next = d.join(msgs, Seq("node"), "left")
        .select(col("node"),
          least(col("dist"), coalesce(col("md"), lit(Inf))).as("dist"))
      // every-other-round truncation: the odd rounds persist (lazy —
      // the state's two references per round still compute it once)
      // instead of paying an eager checkpoint job, so plan depth stays
      // bounded at two rounds' subtrees while the loop schedules half
      // the materialization jobs
      if (i % 2 == 0) next.localCheckpoint() else next.persist()
    }
  }

  /** DuckDB rendering: the same rounds unrolled as CTEs over caller-
    * provided CTEs `e` (src, dst) and `seeds` (node). Ends in CTE
    * `bfs` = (node, dist). */
  def oracleCtes(iters: Int): String = {
    def step(i: Int): String =
      s"""m$i AS (SELECT a.dst AS node, min(d.dist) + 1 AS md
         |  FROM adj a JOIN d${i - 1} d ON d.node = a.src
         |  WHERE d.dist < $Inf GROUP BY 1),
         |d$i AS (SELECT d.node, least(d.dist, coalesce(m$i.md, $Inf)) AS dist
         |  FROM d${i - 1} d LEFT JOIN m$i ON m$i.node = d.node)""".stripMargin
    s"""adj AS MATERIALIZED (
       |  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |d0 AS MATERIALIZED (
       |  SELECT n.node, CASE WHEN s.node IS NULL THEN ${Inf}::BIGINT
       |    ELSE 0::BIGINT END AS dist
       |  FROM (SELECT DISTINCT src AS node FROM adj) n
       |  LEFT JOIN (SELECT DISTINCT node FROM seeds) s ON s.node = n.node),
       |${(1 to iters).map(step).mkString(",\n")},
       |bfs AS (SELECT node, dist FROM d$iters)""".stripMargin
  }
}
