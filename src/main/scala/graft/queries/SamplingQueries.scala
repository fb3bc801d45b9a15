package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dataset-assembly extension queries (q63–q65): reproducible sampling
  * and splitting — the operations that decide what 100 TB of candidate
  * text actually enters a training run. All hash-based (content-
  * addressed md5 buckets), never rand(): the assignment of a document
  * to train/val/test must survive re-runs, retries, and engine swaps,
  * which a seeded RNG over a shuffled partitioning does not.
  */
object SamplingQueries {

  /** Portable md5 bucket in [0, buckets): same value in Spark and DuckDB. */
  private def hashBucket(c: Column, salt: String, buckets: Int): Column =
    pmod(conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 6), 16, 10)
      .cast("long"), lit(buckets))

  private def hashBucketSql(e: String, salt: String, buckets: Int): String =
    s"CAST('0x' || substr(md5('$salt' || CAST($e AS VARCHAR)), 1, 6) AS BIGINT) % $buckets"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 10% reproducible sample of documents.
    "q63_hash_sample" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("bucket", hashBucket(col("doc_id"), "sample:", 100))
        .where(col("bucket") < 10)
        .select("doc_id", "bucket", "lang")
        .orderBy("doc_id")),

    // 80/10/10 train/val/test split + per-split counts as a sanity row.
    "q64_dataset_split" -> ((s, dir) => {
      val b = hashBucket(col("doc_id"), "split:", 100)
      Tables.load(s, dir, "documents")
        .withColumn("split",
          when(b < 80, "train").when(b < 90, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          // BIGINT on both sides: DuckDB's sum(int) is HUGEINT, whose
          // canonical string the driver hashes differently from int64.
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("split")
    }),

    // Inverse-frequency class weights over the embeddings labels.
    // Single pass: one groupBy scan, then total/n_labels via a global
    // window over the |labels|-row aggregate (tiny by construction, so
    // the unpartitioned window never sees more than a handful of rows).
    "q65_label_weights" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy()
      Tables.load(s, dir, "embeddings")
        .groupBy("label").agg(count(lit(1)).as("n"))
        .withColumn("weight",
          sum(col("n")).over(w).cast("double") /
            // count only non-null label groups: the oracle's
            // COUNT(DISTINCT label) excludes NULLs, and a bare count of
            // grouped rows would include a NULL-label group
            (count(when(col("label").isNotNull, lit(1))).over(w) * col("n")))
        .select("label", "n", "weight")
        .orderBy("label")
    }))

  val oracleSql: Map[String, String] = Map(
    "q63_hash_sample" ->
      s"""SELECT doc_id, ${hashBucketSql("doc_id", "sample:", 100)} AS bucket, lang
         |FROM documents WHERE ${hashBucketSql("doc_id", "sample:", 100)} < 10
         |ORDER BY doc_id""".stripMargin,

    "q64_dataset_split" -> {
      val b = hashBucketSql("doc_id", "split:", 100)
      s"""SELECT CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin
    },

    "q65_label_weights" ->
      """SELECT label, count(*) AS n,
        |  CAST((SELECT count(*) FROM embeddings) AS DOUBLE) /
        |    ((SELECT count(DISTINCT label) FROM embeddings) * count(*)) AS weight
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)
}
