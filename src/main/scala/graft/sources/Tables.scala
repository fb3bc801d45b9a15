package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit schemas + readers for the driver fixture tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §2).
  *
  * Schema-on-read is declared, never inferred — mirrors the reference's
  * fixed-DDL contract (reference `dags/dag.py:494-510`) per SURVEY.md §1.3.
  * At 100 TB scale, schema inference is a full extra pass over footers and
  * a correctness hazard (type drift between files); a declared schema also
  * lets Catalyst prune columns/row-groups against a known layout.
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** `ts` is parquet TIMESTAMP(NANOS) — Spark has no nanosecond timestamp,
    * so it is read as a nanos Long (legacy nanosAsLong) and floored to
    * micros in `load`, matching DuckDB's ns→µs truncation exactly. */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** The reference's durable `posts` relation (reference `dags/dag.py:494-510`).
    * `salary_currency` carries BOTH the string 'None' (regex matched, empty
    * currency group — `dags/dag.py:32`) and true SQL NULL (no regex match).
    */
  val posts: StructType = StructType(Seq(
    StructField("post_id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("url", StringType),
    StructField("author", StringType),
    StructField("created_datetime", TimestampType),
    StructField("upvotes", IntegerType),
    StructField("comments_count", IntegerType),
    StructField("subreddit", StringType),
    StructField("salary_currency", StringType),
    StructField("lower_salary", DoubleType),
    StructField("upper_salary", DoubleType),
    StructField("job_position", StringType),
    StructField("location", StringType),
    StructField("field", StringType),
    StructField("technologies", ArrayType(StringType))))

  /** Read one fixture table with its declared schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = {
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    }
    if (name == "events")
      // integer division — a double round-trip would lose precision on
      // ~1.7e18 nanos values (53-bit mantissa)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** `events` with a ts range applied in the RAW nanos-long domain,
    * BEFORE the µs conversion. The post-`load` conversion expression
    * (`timestamp_micros(ts div 1000)`) is a pushdown barrier — a
    * predicate over it reaches parquet as bare `IsNotNull`, so a range
    * query scans every row group. Translating the bounds instead of the
    * column (`floor(n/1000) ∈ [lo_µs, hi_µs] ⟺ n ∈ [lo_µs·1000,
    * hi_µs·1000 + 999]`, exact for the non-negative fixture domain)
    * pushes both comparisons into the scan, where parquet min/max stats
    * skip whole row groups — the difference between a bounded
    * incremental read and a full-table scan at 100 TB. Callers layer
    * the exact µs-domain filter on top (cheap, already pruned). */
  def loadEventsRange(spark: SparkSession, sfDir: String,
                      from: org.apache.spark.sql.Column,
                      to: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.schema(events).parquet(s"$sfDir/events.parquet")
      .where(col("ts") >= unix_micros(from) * lit(1000L) &&
             col("ts") <= unix_micros(to) * lit(1000L) + lit(999L))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
