package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Transform
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query registries; every `queries` key has a
  * DuckDB oracle in `oracleSql` unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship: the reference's full transform pipeline (SURVEY.md §3 entry
    * point 2) over the posts proxy on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Transform(PostsProxy.df(spark, "/root/testdata/sf0.001"), "doc_id")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      SamplingQueries.queries ++ CorpusQueries.queries ++
      ClusteringQueries.queries ++ GraphQueries.queries ++
      MiningQueries.queries ++ GovernanceQueries.queries ++
      OpsQueries.queries ++ EvalQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSql ++ RelationalQueries.oracleSql ++
      TextQueries.oracleSql ++ DedupQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ MultimodalQueries.oracleSql ++
      SamplingQueries.oracleSql ++ CorpusQueries.oracleSql ++
      ClusteringQueries.oracleSql ++ GraphQueries.oracleSql ++
      MiningQueries.oracleSql ++ GovernanceQueries.oracleSql ++
      OpsQueries.oracleSql ++ EvalQueries.oracleSql
}
