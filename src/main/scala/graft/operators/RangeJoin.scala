package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval-containment) join. Spark plans a bare
  * `l.ts BETWEEN r.start AND r.end` join as broadcast-nested-loop —
  * O(|L|·|R|) and a 100 TB death sentence. Bucketizing turns it into an
  * equi-join: left rows key by their time bucket, right intervals
  * explode into every bucket they overlap, the join runs on the bucket
  * key (one hash shuffle), and the exact predicate filters within
  * buckets. Each left row carries exactly ONE bucket, so no pair can be
  * produced twice. Bucket width trades explode factor (long intervals)
  * against bucket density (short ones) — size it near the median
  * interval length. */
object RangeJoin {

  /** All (left row, right interval) pairs with
    * `right.start <= left.ts <= right.end`.
    * Interval bounds and `ts` must be timestamps. */
  def containmentJoin(left: DataFrame, leftTs: String,
                      right: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long = 3600L): DataFrame = {
    val lb = left.withColumn("__b",
      floor(unix_timestamp(col(leftTs)) / bucketSeconds).cast("long"))
    val rb = right.withColumn("__b", explode(sequence(
      floor(unix_timestamp(col(startCol)) / bucketSeconds).cast("long"),
      floor(unix_timestamp(col(endCol)) / bucketSeconds).cast("long"))))
    lb.join(rb, Seq("__b"), "inner")
      .where(col(leftTs) >= col(startCol) && col(leftTs) <= col(endCol))
      .drop("__b")
  }
}
