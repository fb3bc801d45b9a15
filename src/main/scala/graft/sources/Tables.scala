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

  /** `ts` is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — a naive
    * wall-clock column. Declaring it `TimestampType` under the pinned
    * UTC session reads the identical wall-clock instants DuckDB's naive
    * TIMESTAMP sees, and (unlike a post-read conversion expression)
    * keeps range predicates eligible for parquet row-group pushdown. */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
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
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")

  /** `events` with the ts range applied DIRECTLY on the scan column —
    * no conversion expression sits between the filter and the parquet
    * reader, so both comparisons push into the scan where min/max
    * row-group stats skip whole chunks: the difference between a
    * bounded incremental read and a full-table scan at 100 TB.
    * (Historical note: when the fixture carried TIMESTAMP(NANOS) this
    * required translating the bounds into the raw nanos-long domain;
    * the µs fixture makes the natural predicate pushdown-eligible.) */
  def loadEventsRange(spark: SparkSession, sfDir: String,
                      from: org.apache.spark.sql.Column,
                      to: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.schema(events).parquet(s"$sfDir/events.parquet")
      .where(col("ts") >= from && col("ts") <= to)
  }
}
