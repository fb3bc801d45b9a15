package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType}

/** Native Catalyst expression: exact int64 matrix–vector product —
  * `graft_matvec(vec: array<bigint>, m: array<array<bigint>>)` returns
  * `array<bigint>` with `out[j] = Σ_i vec[i] · m[j][i]`.
  *
  * The kernel behind random-projection sketches (q159's
  * Johnson–Lindenstrauss ±1 projection): the matrix rides as a plan
  * literal (rows = output dims), and a whole-stage-codegen'd double
  * loop replaces what would otherwise be `out_dims` interpreted
  * `aggregate(zip_with(...))` higher-order calls per row — the same
  * rationale as [[SqDistLong]]. Integer arithmetic needs no fold-order
  * contract: any evaluation order matches the DuckDB
  * `list_reduce`-per-row rendering bit-for-bit.
  *
  * Null contract (matches the HOF reference form): null vec or null
  * matrix → null; a null element, null matrix row, or a row whose
  * length differs from the vector's → null result.
  */
case class MatVecLong(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case NullType => true
    case _ => false
  }

  private def isLongMatrix(t: DataType): Boolean = t match {
    case ArrayType(inner, _) => isLongArray(inner)
    case NullType => true
    case _ => false
  }

  /** Typed analysis error instead of an opaque "unresolved expression"
    * (round-8 advisor): misuse (e.g. array<int> input) now reports the
    * expected signature, matching the sibling MultiMatchCount. */
  override def checkInputDataTypes(): TypeCheckResult =
    if (!isLongArray(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_matvec expects (array<bigint>, array<array<bigint>>); " +
          s"first argument is ${left.dataType.simpleString}")
    else if (!isLongMatrix(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_matvec expects (array<bigint>, array<array<bigint>>); " +
          s"second argument is ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_matvec"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    val rows = m.numElements()
    val out = new Array[Long](rows)
    var j = 0
    while (j < rows) {
      if (m.isNullAt(j)) return null
      val row = m.getArray(j)
      if (row.numElements() != n) return null
      var acc = 0L
      var i = 0
      while (i < n) {
        if (v.isNullAt(i) || row.isNullAt(i)) return null
        acc += v.getLong(i) * row.getLong(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val rows = ctx.freshName("rows")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val arrayData = classOf[ArrayData].getName
      val genericArrayData = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |int $rows = $b.numElements();
         |long[] $out = new long[$rows];
         |for (int $j = 0; $j < $rows && !${ev.isNull}; $j++) {
         |  if ($b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  $arrayData $row = $b.getArray($j);
         |  if ($row.numElements() != $n) { ${ev.isNull} = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $row.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $row.getLong($i);
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = new $genericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVecLong =
    copy(left = newLeft, right = newRight)
}
