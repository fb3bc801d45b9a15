package graft.operators

import org.apache.spark.sql.SparkSession

/** Scale-adaptive partition sizing for the iterative graph loops
  * (optimization guide §2: derive partitioning from input size, never
  * from a constant tuned for one deployment).
  *
  * Why not the session default: a Pregel-style loop reuses its
  * persisted adjacency every round, so the adjacency's partition count
  * sets the width of EVERY per-round join/aggregate stage. At the
  * session's 32 (= core count) on a sub-million-row graph, each round
  * schedules 32 tasks whose per-task fixed cost (dispatch, codegen
  * lookup, shuffle writer setup) dwarfs its ~20k-row compute — measured
  * on q112 (587k symmetrized edges, 3 rounds): 32 partitions = 3.97
  * s/run with 106 s of task time; 4 partitions = 1.73 s/run with ~16 s
  * of task time, identical results. Sizing by rows keeps partitions
  * ~work-proportional at every scale: small graphs collapse to a few
  * meaty tasks, large graphs grow partitions linearly until the
  * session width (the cluster-size knob, SPARK_GRAFT_CPUS here) caps
  * them. AQE cannot do this for us: the persisted adjacency's
  * REPARTITION_BY_COL width is user-specified, and the downstream
  * ENSURE_REQUIREMENTS exchanges align to it.
  *
  * [[Components.connectedComponents]] pioneered the pattern (500k
  * rows/partition since round 9); the graph family now shares one
  * implementation. Target default 150k rows: the q112 sweep put the
  * optimum at 4–8 partitions for 587k rows (100–150k rows each), and
  * a round's join+combine over 150k rows (~30–60 ms) comfortably
  * amortizes task fixed costs without starving parallelism.
  */
object LoopSizing {

  /** Loop partition count for an iterative operator over `rows`
    * input rows: rows/`targetRows` (≥1), capped at the session's
    * configured shuffle width. */
  def partitions(spark: SparkSession, rows: Long,
                 targetRows: Long = 150000L): Int = {
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    math.min(math.max(sessionParts, 1),
      math.max(1, (rows / targetRows).toInt + 1))
  }
}
