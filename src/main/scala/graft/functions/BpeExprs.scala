package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the BPE merge step (reference behavior: the
  * adjacent-pair statistics of dags/dag.py's token handling generalized
  * to the tokenizer-training loop a large-scale curation pipeline
  * runs; companion to q99's pair counts and q96's vocab sizing).
  *
  * Greedy left-to-right single-pair merge — the textbook BPE
  * re-tokenization for ONE learned merge `(l, r)`:
  * scan `i = 0..n-1`; when `toks(i) == l && toks(i+1) == r`, emit the
  * concatenation `l ++ r` and advance by 2, else emit `toks(i)` and
  * advance by 1. On a run of equal tokens with `l == r` this takes
  * positions `0, 2, 4, …` of the run (`[a,a,a]` under `(a,a)` is
  * `[aa, a]`, never `[a, aa]`).
  *
  * Equivalence used by the DuckDB oracle rendering: for `l != r` two
  * matches can never overlap (a match at p and p+1 would force
  * `toks(p+1) = r = l`), so ALL matches merge; for `l == r` the merged
  * positions are exactly the even offsets within each maximal run of
  * consecutive match positions — which is how the oracle expresses the
  * scan relationally (gaps-and-islands + row-number parity) without a
  * recursive CTE.
  *
  * Null elements never match (SQL equality with NULL is not true) and
  * pass through unchanged.
  */
object BpeKernels {

  def mergePair(toks: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = toks.numElements()
    val out = new Array[AnyRef](n)
    var merged: UTF8String = null // built lazily: most rows have no match
    var i = 0
    var k = 0
    while (i < n) {
      if (i + 1 < n && !toks.isNullAt(i) && !toks.isNullAt(i + 1) &&
          l.equals(toks.getUTF8String(i)) && r.equals(toks.getUTF8String(i + 1))) {
        if (merged == null) merged = UTF8String.concat(l, r)
        out(k) = merged
        k += 1
        i += 2
      } else {
        out(k) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        k += 1
        i += 1
      }
    }
    new GenericArrayData(
      if (k == n) out else java.util.Arrays.copyOf(out, k))
  }
}

/** `graft_merge_pair(array<string>, l, r) -> array<string>` — one
  * greedy left-to-right BPE merge pass as a single JIT'd loop. `l`/`r`
  * are ordinary expressions (the learner passes literals, so the pair
  * is pinned into the generated code's constant pool). */
case class MergePairExpr(toks: Expression, l: Expression, r: Expression)
    extends TernaryExpression {
  override def first: Expression = toks
  override def second: Expression = l
  override def third: Expression = r

  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, l.dataType, r.dataType) match {
      case (ArrayType(StringType, _) | NullType,
            StringType | NullType, StringType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string, string), got " +
          s"(${t.catalogString}, ${lt.catalogString}, ${rt.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_merge_pair"

  override protected def nullSafeEval(t: Any, lv: Any, rv: Any): Any =
    BpeKernels.mergePair(t.asInstanceOf[ArrayData],
      lv.asInstanceOf[UTF8String], rv.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, lv, rv) =>
      s"graft.functions.BpeKernels.mergePair($t, $lv, $rv)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MergePairExpr =
    copy(toks = f, l = s, r = t)
}
