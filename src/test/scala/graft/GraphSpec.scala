package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Exact-integer PageRank invariants: bit-identical agreement with a
  * driver-side reference fold (the property that makes the unrolled
  * DuckDB differential oracle possible), centrality ordering on a star
  * graph, mass accounting under truncating division, and partition
  * invariance.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the same synchronous integer update over a
    * Map — independent of Spark's join/agg path. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map { case (s, d) => (d, s) })
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val deg = adj.map { case (s, ds) => s -> ds.size.toLong }
    val n = deg.size.toLong
    val base = (15L * (PageRank.Mass / n)) / 100L
    var r = deg.map { case (v, _) => v -> PageRank.Mass / n }
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, ds) <- adj; d <- ds) in(d) += r(u) / deg(u)
      r = deg.map { case (v, _) =>
        v -> ((PageRank.DampNum * in(v)) / PageRank.DampDen + base) }
    }
    r
  }

  private def runToMap(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("ranks match the driver-side reference fold bit-for-bit on a random graph") {
    val rng = new scala.util.Random(7)
    val edges = (0 until 120).map(_ =>
      (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter { case (s, d) => s != d }.distinct
    for (iters <- Seq(1, 3)) {
      assert(runToMap(edges, iters) == refRanks(edges, iters),
        s"iters=$iters diverged from reference")
    }
  }

  test("star graph: center outranks every leaf, leaves tie exactly") {
    val edges = (1L to 8L).map(l => (0L, l))
    val ranks = runToMap(edges, 3)
    val leaves = (1L to 8L).map(ranks)
    assert(leaves.distinct.size == 1, "leaves must tie bit-exactly")
    assert(ranks(0L) > leaves.head, "center must outrank leaves")
  }

  test("mass accounting: total rank stays within truncation loss of Mass") {
    val rng = new scala.util.Random(11)
    val edges = (0 until 200).map(_ =>
      (rng.nextInt(50).toLong, rng.nextInt(50).toLong))
      .filter { case (s, d) => s != d }.distinct
    val ranks = runToMap(edges, 3)
    val total = ranks.values.sum
    // each of the n nodes can lose < 1 unit per div (3 divs per node
    // per iteration on this scale) — loss is bounded far below 1% of
    // Mass, and truncation can never create mass
    assert(total <= PageRank.Mass)
    assert(total > PageRank.Mass * 99L / 100L, s"total=$total lost too much mass")
  }

  test("partition invariance: repartitioned edges give identical ranks") {
    val rng = new scala.util.Random(13)
    val edges = (0 until 80).map(_ =>
      (rng.nextInt(20).toLong, rng.nextInt(20).toLong))
      .filter { case (s, d) => s != d }.distinct
    val base = runToMap(edges, 2)
    val shuffled = PageRank.run(
        scala.util.Random.shuffle(edges).toDF("src", "dst").repartition(7), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(base == shuffled)
  }

  test("deg column is the undirected degree") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val degs = PageRank.run(edges.toDF("src", "dst"), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(degs == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
