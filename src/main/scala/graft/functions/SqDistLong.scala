package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType}

/** Native Catalyst expression: exact int64 squared-L2 distance between
  * two `array<bigint>` columns (the KMeans-quantized embedding space),
  * with whole-stage codegen.
  *
  * Same rationale as [[DotProduct]]: the composable
  * `aggregate(zip_with(a, b, ...), ...)` form is a higher-order
  * function — interpreted, per-row lambda dispatch, intermediate
  * ArrayData — and this kernel sits inside the within-cluster pair
  * join of the cluster-blocked semantic dedup (q111), i.e. the hot
  * loop (measured 5.4 s → see BASELINE.md after the swap at sf0.1).
  * Integer arithmetic means no fold-order contract is even needed:
  * the sum is exact, so any evaluation order matches the DuckDB
  * `list_reduce` rendering ([[graft.operators.KMeans.sqDistSql]])
  * bit-for-bit. Quantized components are ≤ 2^22 (see
  * [[graft.operators.KMeans.Scale]]), so 64-dim sums stay ≤ 2^50 —
  * no overflow.
  *
  * Null contract (matches the `zip_with`+`aggregate` reference form
  * pinned in ClusteringSpec): null array → null, null ELEMENT → null,
  * and mismatched lengths → null (zip_with pads the short side with
  * nulls, which poisons the fold).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case NullType => true
    case _ => false
  }

  override lazy val resolved: Boolean =
    childrenResolved && isLongArray(left.dataType) && isLongArray(right.dataType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sqdist"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}
