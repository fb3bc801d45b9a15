package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink layout (SNK2): the reference creates an index on
  * `created_datetime` (reference `dags/dag.py:511`) to accelerate the
  * incremental MAX read (O2/O6). The Spark-native analog is physical
  * layout: date-partition the files and sort rows within partitions by
  * the timestamp — the high-water-mark query then prunes to ~window
  * partitions and row-group min/max statistics skip within them. */
object Sink {

  /** Write `df` date-partitioned by `tsCol` (partition column `dt`),
    * clustered so each output partition is one sorted file run. */
  def writeTimePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("dt", to_date(col(tsCol)))
      .repartition(col("dt"))
      .sortWithinPartitions(col("dt"), col(tsCol))
      .write.mode("overwrite")
      .partitionBy("dt")
      .parquet(path)
}
