package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Unsplittable-input fan-out (optimization guide §2.5 "input skew":
  * "one huge unsplittable file … otherwise repartition immediately
  * after the read").
  *
  * The driver fixtures are SINGLE-ROW-GROUP parquet files, and a parquet
  * row group is atomic to the reader — `spark.sql.files.minPartitionNum`
  * produces 32 byte-range splits but every row lands in the one task
  * whose split contains the row group, so the whole scan→first-exchange
  * segment of every query runs serial (measured: q181's scan+explode+
  * partial-agg stage = 1.44 s wall / 1.41 s cpu on 32 cores — one task
  * did all of it). For queries whose pre-shuffle map work dominates
  * (token/gram explosion, per-byte fingerprints, kernel projections),
  * one hash repartition right after the read unlocks the cores: the
  * shuffle moves the raw rows once (bytes the stage must read anyway),
  * and the ≥10× expansion work after it runs parallel.
  *
  * Scale posture: partition count comes from `spark.sql.shuffle.partitions`
  * (set from SPARK_GRAFT_CPUS by the harness) — no local constant; the
  * key is a stable high-cardinality id, so the hash spreads evenly at
  * any scale; `repartition(col)` (REPARTITION_BY_COL) is deliberately
  * chosen over round-robin `repartition(n)` — deterministic row
  * placement under task retry (guide §2.5, SPARK-38388) and no
  * sort-before-repartition cost. On a production many-file layout the
  * same call is the standard defense against unsplittable/skewed
  * inputs; apply it ONLY where per-row map work dominates the scan —
  * for plain scan→aggregate queries the parquet decode is the whole
  * stage and a fan-out would just add a shuffle.
  *
  * Results are unchanged: every consumer below a fan-out is either a
  * key-partitioned aggregation/join (placement-invariant by semantics)
  * with exact (integer/string/min/max/count) merge functions, or
  * re-establishes its own total order downstream — audited per call
  * site, OPTIMIZATION_r14.md has the list.
  */
object FanOut {

  /** Hash-repartition `df` by `key` to unlock post-scan parallelism.
    * No-op in spirit (same rows, same values, different placement);
    * see object scaladoc for when to use it.
    *
    * The partition count is pinned to `defaultParallelism` (= the
    * executor core count, SPARK_GRAFT_CPUS here — an env-derived value,
    * not a local constant): a bare `repartition(col)` is
    * REPARTITION_BY_COL, which AQE's coalescer is free to shrink by
    * byte size — and a fan-out exists precisely because the byte size
    * UNDER-states the downstream expansion work (measured: AQE
    * re-coalesced q181's 872 KB post-repartition stage back to one
    * task). Pinning the count makes the stage width follow the core
    * count, which is also what the driver's reduced-core scaling run
    * expects. */
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
