package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validated load with a dead-letter channel: the scale restatement of
  * the reference's per-row try/except quarantine (`dags/dag.py:270-272,
  * 417-419`). Instead of swallowing bad rows in a loop, rules are named
  * Column predicates evaluated in one codegen'd pass; failing rows are
  * routed to a rejects relation carrying the list of violated rules —
  * auditable, replayable, and O(rows) at any scale. */
object Quarantine {

  /** @param rules (name, predicate-that-must-hold) pairs
    * @return (valid rows, rejected rows + `reject_reasons` array) */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val reasons = array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name)) // null predicate = violation
    }: _*)
    val tagged = df.withColumn("reject_reasons",
      filter(reasons, r => r.isNotNull))
    val valid = tagged.where(size(col("reject_reasons")) === 0)
      .drop("reject_reasons")
    val rejects = tagged.where(size(col("reject_reasons")) > 0)
    (valid, rejects)
  }
}
