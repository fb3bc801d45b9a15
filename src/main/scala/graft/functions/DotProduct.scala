package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NullType}

/** Native Catalyst expression: dot product of two `array<float>` columns
  * in double precision, with whole-stage codegen (`doGenCode`).
  *
  * Why a custom Expression (builder-prompt preference ladder (b)): the
  * composable alternative — `aggregate(zip_with(a, b, ...), ...)` — is a
  * higher-order function, which Catalyst evaluates interpreted (no
  * codegen, per-row lambda dispatch, intermediate ArrayData). This
  * kernel sits inside O(n²) similarity joins, so it is THE hot loop of
  * the embedding operators; codegen makes it a tight JIT'd `for` over
  * the columnar arrays.
  *
  * Numeric contract: left-to-right fold of per-slot double products with
  * init 0.0 — the exact order of Dedup.dotProductSql's DuckDB
  * `list_reduce` rendering, so results stay bit-identical for the
  * differential oracle. Mismatched lengths use the common prefix (our
  * callers guarantee equal dims); null input → null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float> — enforced here at analysis time
  // (ExpectsInputTypes' AbstractDataType is private[sql], so the check
  // is explicit instead).
  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true // containsNull irrelevant
    case NullType => true // bare NULL literal — evaluates to null
    case _ => false
  }

  override lazy val resolved: Boolean =
    childrenResolved && isFloatArray(left.dataType) && isFloatArray(right.dataType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  // A null ELEMENT nulls the whole result — matching the DuckDB oracle,
  // where CAST(NULL AS DOUBLE)*y propagates NULL through list_reduce.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
