package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Within-query persist with bounded lifetime for library callers.
  *
  * A query that consumes one expensive expansion from two
  * differently-aggregated subtrees legitimately `persist()`s it
  * (exchange reuse cannot fire across differing partial aggregates —
  * measured on q135/q136, OPTIMIZATION_r14.md). The bench harness
  * releases those blocks with a per-query `spark.catalog.clearCache()`,
  * but a caller outside the harness (PlanDump sessions, library reuse)
  * would accumulate one cached RDD per invocation (r14 ADVICE).
  *
  * `persist(tag, df)` keeps AT MOST ONE live cached frame per
  * (session, tag): re-building the same query unpersists the previous
  * build's frame first. The previous frame's actions have necessarily
  * completed (queries are built-then-executed), so the unpersist is
  * safe; at worst a concurrent reader recomputes.
  */
object ScopedCache {

  private val last =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  def persist(tag: String, df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val p = df.persist()
    val prev = last.put((s, tag), p)
    // Unpersist ONLY a logically different predecessor: CacheManager
    // keys entries by PLAN equality, so a rebuild of the same query
    // yields the same entry — unpersisting "prev" there would evict
    // the entry just persisted (observed: q136's shared expansion ran
    // twice again). sameResult ⇒ shared entry ⇒ nothing to release;
    // different plan (new fixture/stamp) ⇒ release the stale copy.
    if (prev != null && !(prev eq p) &&
        !prev.queryExecution.analyzed.sameResult(p.queryExecution.analyzed))
      try prev.unpersist(false)
      catch { case scala.util.control.NonFatal(_) => () }
    val it = last.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    p
  }
}
