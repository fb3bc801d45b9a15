package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact triangle counting with degree-ordered edge
  * orientation (the MapReduce formulation of Suri & Vassilvitskii,
  * "Counting Triangles and the Curse of the Last Reducer", WWW 2011 —
  * public literature).
  *
  * Input: an undirected simple edge set as (u, v) rows with u < v,
  * already distinct. Output: one row per node — (node, deg, tri_cnt,
  * wedge_cnt) — linear in |V|, with wedge_cnt = d·(d−1)/2 so the local
  * clustering coefficient tri_cnt/wedge_cnt is reconstructable exactly
  * from the two integers (no float in the differential surface).
  *
  * Why orientation matters at 100 TB: enumerating wedges at their
  * apex's RAW degree is quadratic in the hub degree — a single
  * 10^6-degree node yields 10^12 wedges. Orienting every edge from the
  * lower to the higher endpoint in the (degree, id) total order and
  * generating wedges only at the oriented apex bounds every node's
  * out-degree by O(√m), so the wedge stage does O(m^{3/2}) work total
  * regardless of skew — the classical bound, achieved here with three
  * hash joins Catalyst can plan freely (no custom partitioner needed:
  * the wedge⋈edge closure is a plain equi-join on the (b, c) pair).
  *
  * Everything is exact integer arithmetic; ties in the orientation
  * order are broken by node id, so the oriented edge set — and hence
  * every intermediate — is deterministic.
  */
object Triangles {

  /** (node, deg, tri_cnt, wedge_cnt), one row per node of `edges`. */
  def run(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))

    // degrees: one map-side-combinable shuffle over the exploded ends;
    // referenced by both orientation joins and the final attach, so
    // materialized once (|V| rows)
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
      .persist()

    // orient low → high in the (degree, id) total order; carry the
    // head's (degree, id) key so the wedge stage can order its legs
    // with NO further join against the degree table
    val keyLo = struct(col("du"), col("u"))
    val keyHi = struct(col("dv"), col("v"))
    val o = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(keyLo < keyHi, col("u")).otherwise(col("v")).as("src"),
        when(keyLo < keyHi, col("v")).otherwise(col("u")).as("dst"),
        when(keyLo < keyHi, col("dv")).otherwise(col("du")).as("dd"))
      // referenced three times below (two wedge legs + the closing
      // probe); materialize once instead of re-running the joins
      .persist()

    // wedges at the oriented apex, legs ordered by the same total
    // order — the closing edge {b, c} can then ONLY be stored b → c
    val w = o.as("o1").join(o.as("o2"),
        col("o1.src") === col("o2.src") &&
          struct(col("o1.dd"), col("o1.dst")) <
            struct(col("o2.dd"), col("o2.dst")))
      .select(col("o1.src").as("a"), col("o1.dst").as("b"),
        col("o2.dst").as("c"))

    val tri = w.join(o.as("o3"),
        col("b") === col("o3.src") && col("c") === col("o3.dst"))
      .select("a", "b", "c")

    // each triangle credited to all three corners
    val tc = tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri"))

    deg.join(tc, Seq("node"), "left")
      .select(col("node"), col("d").as("deg"),
        coalesce(col("tri"), lit(0L)).as("tri_cnt"),
        expr("(d * (d - 1)) div 2").as("wedge_cnt"))
  }

  /** DuckDB CTE chain mirroring [[run]]; expects an `e(u, v)` CTE with
    * u < v distinct in scope, leaves `tri_out(node, deg, tri_cnt,
    * wedge_cnt)`. */
  def oracleCtes: String =
    """deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM
      |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node),
      |o AS MATERIALIZED (
      |  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
      |         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst,
      |         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dd
      |  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
      |tri AS (
      |  SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
      |  FROM o o1 JOIN o o2 ON o1.src = o2.src
      |    AND (o1.dd, o1.dst) < (o2.dd, o2.dst)
      |  JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst),
      |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM
      |  (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      |   UNION ALL SELECT c FROM tri) GROUP BY node),
      |tri_out AS (
      |  SELECT deg.node, deg.d AS deg, COALESCE(tc.tri, 0) AS tri_cnt,
      |    deg.d * (deg.d - 1) // 2 AS wedge_cnt
      |  FROM deg LEFT JOIN tc ON tc.node = deg.node)""".stripMargin
}
