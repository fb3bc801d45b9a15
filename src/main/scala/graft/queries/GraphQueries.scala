package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.PageRank
import graft.sources.Tables

/** Graph / link-analysis extension queries (q112): deterministic
  * integer PageRank over the customer–supplier purchase graph derived
  * from the fact tables — the centrality-as-quality-signal operator
  * (web-corpus pipelines weight documents by the link centrality of
  * their hosts before sampling; this is that computation with the
  * fixture's bipartite purchase relation standing in for the host
  * graph). Engine + exact-arithmetic + 100 TB analysis in
  * [[graft.operators.PageRank]]'s scaladoc.
  */
object GraphQueries {

  /** Synchronous update rounds — fixed, mirrored in the unrolled
    * oracle (the GraphFrames maxIter contract). */
  private val Iters = 3

  /** Node encoding for the bipartite purchase graph: customers at
    * 2·custkey, suppliers at 2·suppkey+1 — disjoint integer ids
    * without a string tag in the shuffle key. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Purchase-graph PageRank: distinct (customer, supplier) edges
    // from orders ⋈ lineitem (the payload never rides past the
    // distinct — the graph build shuffles two fact columns), then
    // Iters synchronous exact-integer updates. Output is linear in
    // node count: (node, kind, deg, rank), ranks on the Mass = 10^12
    // integer scale.
    "q112_pagerank" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val lineitem = Tables.load(s, dir, "lineitem")
      val edges = orders.join(lineitem,
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      PageRank.run(edges, Iters)
        .select(col("node"),
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("supplier")).as("kind"),
          col("deg"), col("rank"))
        .orderBy("node")
    }))

  val oracleSql: Map[String, String] = Map(
    "q112_pagerank" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
         |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
         |${PageRank.oracleCtes(Iters)}
         |SELECT node,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
         |  deg, rank
         |FROM pr ORDER BY node""".stripMargin)
}
