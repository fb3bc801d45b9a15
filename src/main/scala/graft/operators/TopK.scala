package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import graft.plans.TopKPerKey

/** Column-API constructor for the custom TopKPerKey operator (see
  * graft.plans.TopKPerKey for why it beats window+filter). */
object TopK {

  /** Top `k` rows per `keys` group ordered by `order` ((column,
    * ascending?) pairs — give a total order for determinism); appends a
    * `rank` column (1-based). */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
             k: Int): DataFrame = {
    val lp = df.queryExecution.analyzed
    def attr(name: String) = lp.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name in ${lp.output.map(_.name)}"))
    val sortOrder = order.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKey(keys.map(attr), sortOrder, k, lp))
  }
}
