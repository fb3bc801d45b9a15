package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (completing the Catalyst extension set next to
  * the DotProduct Expression and TopKStrategy): push a Filter through
  * TopKPerKey when the predicate references only the operator's KEY
  * columns.
  *
  * Why Catalyst can't do this alone: PushDownPredicates knows the
  * algebra of built-in operators; for a foreign node it must assume the
  * filter and the operator don't commute. For per-key top-k a predicate
  * over the keys selects whole groups without reordering inside them,
  * so pushing it below is semantics-preserving — and at 100 TB it is
  * the difference between top-k-ing every group and scanning only the
  * selected ones (the pushed filter continues down to the parquet scan
  * via the built-in rules afterwards).
  *
  * A predicate touching non-key columns (e.g. `rank <= 2` or a value
  * column) must NOT be pushed: it would change which rows rank. */
object TopKFilterPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, topk @ TopKPerKey(keys, _, _, child, _))
        if f.references.nonEmpty &&
          f.references.subsetOf(AttributeSet(keys.flatMap(_.references))) =>
      topk.copy(child = Filter(cond, child))
  }
}
