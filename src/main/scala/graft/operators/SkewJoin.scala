package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (builder-prompt scale toolkit). AQE's
  * skew-join handles most cases at runtime; explicit salting is the
  * deterministic fallback when one key dominates so heavily that even
  * split shuffle blocks hot-spot a single executor (the classic 100 TB
  * failure mode: one viral post_id / null-bucket key).
  *
  * Shape: the LEFT (large, skewed) side gets a deterministic salt in
  * [0, n) derived from non-key columns; the RIGHT side is exploded n× so
  * every (key, salt) pair finds its match. The join key becomes
  * (key, salt) — the shuffle spreads each hot key over n partitions.
  * Result equals the unsalted inner join exactly (verified in spec).
  *
  * The salt must be deterministic (hash of a row-unique column, not
  * rand()) or retried tasks would re-salt differently — correctness
  * under speculative execution and AQE re-optimization.
  */
object SkewJoin {

  /** Inner-join `left` (skewed) with `right` (small) on `key`,
    * spreading each left key across `salts` shuffle partitions.
    * `saltBy` must be a deterministic per-row expression (e.g. a
    * row-unique id column).
    *
    * `width` (r15): > 0 pins BOTH sides to that many partitions on
    * (key, salt) via REPARTITION_BY_NUM — which AQE never coalesces —
    * keeping the join co-partitioned at exactly that width. Without it
    * the salted exchanges are ENSURE_REQUIREMENTS shuffles that AQE's
    * BYTE-based coalescer folds back together whenever the inputs are
    * small on disk — precisely the compute-dense/byte-light case
    * (banded edit-distance over block pairs) salting exists for:
    * measured on q75 at sf0.1, the salted join ran as ONE task either
    * side of the salt. Pass the env-derived core count for
    * compute-bound pair joins; leave 0 where bytes track work. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      saltBy: Column, salts: Int = 8,
                      width: Int = 0): DataFrame = {
    val salted = left.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val exploded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val (l, r) =
      if (width > 0)
        (salted.repartition(width, col(key), col("__salt")),
          exploded.repartition(width, col(key), col("__salt")))
      else (salted, exploded)
    l.join(r, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
