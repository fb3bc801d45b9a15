package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dataset-assembly extension queries (q63–q65, q85): reproducible
  * sampling and splitting — the operations that decide what 100 TB of
  * candidate text actually enters a training run. All hash-based
  * (content-addressed md5 buckets), never rand(): the assignment of a
  * document to train/val/test must survive re-runs, retries, and
  * engine swaps, which a seeded RNG over a shuffled partitioning does
  * not.
  */
object SamplingQueries {

  /** Portable md5 bucket in [0, buckets): same value in Spark and DuckDB. */
  private def hashBucket(c: Column, salt: String, buckets: Int): Column =
    pmod(conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 6), 16, 10)
      .cast("long"), lit(buckets))

  private def hashBucketSql(e: String, salt: String, buckets: Int): String =
    s"CAST('0x' || substr(md5('$salt' || CAST($e AS VARCHAR)), 1, 6) AS BIGINT) % $buckets"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Source-mixing weights with temperature α = 0.5 — the corpus
    // rebalancing step of multi-source training-set assembly
    // (published recipe: sampling probability ∝ size^α with α < 1 to
    // up-weight small high-quality sources; α = 0.5 keeps the
    // per-source weight an IEEE sqrt, which is CORRECTLY ROUNDED by
    // spec and therefore bit-identical across engines, where a pow()
    // would drift in the last ulp between libm and the JVM). The
    // normalizing sum is the other float hazard: a plain SUM() folds
    // in partition order, so both engines instead fold the per-source
    // weights in EXPLICIT source order (collect → sort → left fold,
    // the fingerprint-fold pattern) — bit-stable under any
    // parallelism. Scale: |sources| rows after one exact count/sum
    // aggregation; the fold is O(|sources|) on a broadcast scalar.
    "q97_source_mixing" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .withColumn("weight", sqrt(col("total_chars").cast("double")))
        .createOrReplaceTempView("mix_src")
      s.sql("""
        |WITH z AS (
        |  SELECT aggregate(array_sort(collect_list(struct(source, weight))),
        |    CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.weight) AS z
        |  FROM mix_src)
        |SELECT /*+ BROADCAST(z) */ source, n_docs, total_chars, weight,
        |  weight / z AS share
        |FROM mix_src CROSS JOIN z ORDER BY source""".stripMargin)
    }),

    // 10% reproducible sample of documents.
    "q63_hash_sample" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("bucket", hashBucket(col("doc_id"), "sample:", 100))
        .where(col("bucket") < 10)
        .select("doc_id", "bucket", "lang")
        .orderBy("doc_id")),

    // Weighted stratified sample — sequential Poisson sampling (the
    // published order-sampling scheme: Ohlsson 1998): priority
    // ξ = u / w with u a content-addressed uniform and w = n_chars;
    // the k SMALLEST ξ per language are the sample, giving inclusion
    // probability ∝ weight with zero RNG state. u is the exact 48-bit
    // md5 integer (portable recipe, exact in a double) and w an exact
    // int, so ξ is ONE IEEE division — engine-identical and
    // re-run-stable — and the per-stratum selection streams through
    // the custom TopKPerKey operator instead of a full sort.
    "q85_weighted_sample" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .where(col("n_chars") > 0) // zero-weight rows are unsampleable
        .withColumn("u", conv(substring(
            md5(concat(lit("ws:"), col("doc_id").cast("string"))), 1, 12), 16, 10)
          .cast("double"))
        .withColumn("priority", col("u") / col("n_chars"))
        .select("doc_id", "lang", "n_chars", "priority")
      graft.operators.TopK.perKey(d, Seq("lang"),
          Seq("priority" -> true, "doc_id" -> true), k = 10)
        .select("lang", "doc_id", "n_chars", "priority", "rank")
        .orderBy("lang", "rank")
    }),

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

    "q85_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS DOUBLE)
        |      / n_chars AS priority
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rank FROM w)
        |SELECT lang, doc_id, n_chars, priority, rank FROM r WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,

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
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    // q97: sqrt is correctly rounded (bit-identical across engines);
    // the normalizer folds the weights in explicit source order on
    // both sides, never a partition-order SUM of doubles.
    "q97_source_mixing" ->
      """WITH a AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY source),
        |w AS (SELECT *, sqrt(CAST(total_chars AS DOUBLE)) AS weight FROM a),
        |z AS (SELECT list_reduce(
        |    list_concat([CAST(0 AS DOUBLE)], list(weight ORDER BY source)),
        |    (acc, x) -> acc + x) AS z FROM w)
        |SELECT source, n_docs, total_chars, weight, weight / z.z AS share
        |FROM w CROSS JOIN z ORDER BY source""".stripMargin)
}
