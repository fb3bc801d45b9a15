package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — the canonical time-series operator Spark
  * lacks natively: for every left row, attach the LATEST right row with
  * the same key and `rightTs <= leftTs` (left-outer semantics: no prior
  * right row → nulls).
  *
  * Algorithm (the scale-correct one): tag and UNION both sides, sort
  * within key by (ts, tag) — right rows sort before left rows at equal
  * timestamps, giving `>=` semantics — and carry right attributes
  * forward with `last(struct, ignoreNulls)` over the running frame. ONE
  * hash shuffle on the key + one sort, no range-condition join (which
  * Spark would plan as a broadcast-nested-loop or an exploding
  * inequality join at 100 TB).
  *
  * Requirement: the right side must be unique per (key, ts) — pre-
  * aggregate if needed — otherwise "the latest prior row" is
  * ill-defined (DuckDB's native ASOF JOIN, the differential oracle in
  * q58, has the same precondition).
  */
object AsOfJoin {

  /** @param left      rows to enrich (all columns preserved)
    * @param right     reference timeline, unique per (key, ts)
    * @param key       equi-join key column (same name both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name; emitted as `matched_ts`
    * @param rightCols right value columns to carry */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    val carried = left.columns.toSeq.filterNot(_ == key)
    val rStruct = struct(col(rightTs).as("matched_ts") +: rightCols.map(col): _*)
    val rType = right.select(rStruct.as("__r")).schema("__r").dataType

    val rightSide = right.select(
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        carried.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(rStruct.as("__r")): _*)
    val leftSide = left.select(
      Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        carried.map(col) ++
        Seq(lit(null).cast(rType).as("__r")): _*)

    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightSide.unionByName(leftSide)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(left.columns.toSeq.map(col) :+ col("__last_r.*"): _*)
  }
}
