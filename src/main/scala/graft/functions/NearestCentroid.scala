package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression `graft_nearest(vec, centroids)`: the
  * k-means assignment kernel — exact int64 squared-L2 argmin of a
  * quantized `array<bigint>` vector against an `array<array<bigint>>`
  * centroid table, returning `struct<d: bigint, c: int>` (min distance
  * and the index of the first centroid attaining it; ties keep the
  * SMALLEST index, matching the oracle's `ORDER BY dist, cid`).
  *
  * Why a custom Expression (builder-prompt preference ladder (b)): the
  * composable form — `array_min(transform(cents, c -> struct(
  * aggregate(zip_with(...)), cid)))` — is three nested higher-order
  * functions, which Catalyst evaluates interpreted with per-row lambda
  * dispatch and intermediate ArrayData allocation, k·dim times per row.
  * This kernel is the per-iteration hot loop of
  * [[graft.operators.KMeans]]; `doGenCode` makes it two tight JIT'd
  * `for` loops with zero allocation per centroid.
  *
  * Numeric contract: pure int64 arithmetic (components ≤ 2^22 by the
  * KMeans quantization, so k·dim products stay far below overflow) —
  * bit-identical between the interpreted and codegen paths and the
  * DuckDB oracle by construction. Null vector (or a null element, which
  * quantization never produces) → null; an empty centroid table → null.
  */
case class NearestCentroid(left: Expression, right: Expression)
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

  override lazy val resolved: Boolean =
    childrenResolved && isLongArray(left.dataType) && isLongMatrix(right.dataType)

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("c", IntegerType, nullable = false)))

  override def prettyName: String = "graft_nearest"

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any, cs: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val k = cents.numElements()
    var bestD = Long.MaxValue
    var bestC = -1
    var j = 0
    while (j < k) {
      val c = cents.getArray(j)
      val n = math.min(x.numElements(), c.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val diff = x.getLong(i) - c.getLong(i)
        acc += diff * diff
        i += 1
      }
      if (acc < bestD) { bestD = acc; bestC = j }
      j += 1
    }
    if (bestC < 0) null
    else new GenericInternalRow(Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      s"""
         |int $k = $cs.numElements();
         |long $bestD = Long.MAX_VALUE;
         |int $bestC = -1;
         |for (int $j = 0; $j < $k && !${ev.isNull}; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $cs.getArray($j);
         |  int $n = java.lang.Math.min($v.numElements(), $c.numElements());
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $diff = $v.getLong($i) - $c.getLong($i);
         |    $acc += $diff * $diff;
         |  }
         |  if (!${ev.isNull} && $acc < $bestD) { $bestD = $acc; $bestC = $j; }
         |}
         |if ($bestC < 0) ${ev.isNull} = true;
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestD, $bestC});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
