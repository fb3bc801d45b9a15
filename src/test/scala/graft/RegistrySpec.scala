package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Registry consistency: Map ++ silently overrides duplicate keys, so a
  * name collision between query modules would drop coverage without any
  * failure — pin the arithmetic here. */
class RegistrySpec extends AnyFunSuite {

  private val modules = Seq(
    "reference" -> ReferenceQueries.queries.keySet,
    "relational" -> RelationalQueries.queries.keySet,
    "text" -> TextQueries.queries.keySet,
    "dedup" -> DedupQueries.queries.keySet,
    "similarity" -> SimilarityQueries.queries.keySet,
    "multimodal" -> MultimodalQueries.queries.keySet,
    "sampling" -> SamplingQueries.queries.keySet,
    "corpus" -> CorpusQueries.queries.keySet,
    "clustering" -> ClusteringQueries.queries.keySet,
    "graph" -> GraphQueries.queries.keySet,
    "mining" -> MiningQueries.queries.keySet,
    "governance" -> GovernanceQueries.queries.keySet,
    "ops" -> OpsQueries.queries.keySet,
    "eval" -> EvalQueries.queries.keySet)

  test("no query-name collisions across modules") {
    val total = modules.map(_._2.size).sum
    assert(total == SparkEntry.queries.size,
      s"collision: modules sum to $total but merged registry has ${SparkEntry.queries.size}")
  }

  test("every oracle refers to a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle (no rows-only checks left)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracles: $noOracle")
  }
}
