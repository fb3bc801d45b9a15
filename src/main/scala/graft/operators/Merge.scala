package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SNK1: keyed upsert (reference `dags/dag.py:380-421`: per-row
  * `INSERT ... ON CONFLICT (post_id) DO UPDATE` — last-writer-wins on key).
  *
  * Spark has no MERGE on vanilla sinks, so the relational restatement is
  * updates ∪ (target ⟕anti updates): every key present in `updates`
  * replaces the target row wholesale, new keys append (SURVEY.md §2.1).
  * Idempotent: merge(merge(t, u), u) == merge(t, u) — the reference's
  * effectively-once guarantee (ST4).
  *
  * Scale: the anti join shuffles both sides on the key once. When `updates`
  * is a micro-batch (the reference's O(100) rows/day against a years-deep
  * target), Catalyst/AQE broadcasts it and the target is never shuffled —
  * the plan degenerates to a scan + broadcast-anti-join + union, which is
  * the right 100 TB shape. A ts-partitioned target would further prune the
  * rewrite to touched partitions.
  */
object Merge {

  /** Last-writer-wins keyed upsert. `updates` must be unique per key
    * (dedup upstream, as the reference's PK insert order implies). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    val kept = target.join(updates.select(keys.map(col): _*), keys, "left_anti")
    kept.select(cols.map(col): _*)
      .unionByName(updates.select(cols.map(col): _*))
  }
}
