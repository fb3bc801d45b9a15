package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975, "Efficient
  * string matching: an aid to bibliographic search") compiled into a
  * byte-level automaton with a fully materialized transition table.
  *
  * Why this is THE multi-pattern shape at 100 TB: a blocklist scrub
  * (stop phrases, license boilerplate, contamination markers) applies
  * HUNDREDS of literal patterns to every document ever ingested. The
  * composable form — one `contains`/`instr` per pattern — re-scans the
  * text P times (O(P·|text|)); the automaton scans ONCE, O(|text| +
  * matches), independent of pattern count. The table is built once per
  * expression instance on the driver, ships as a plan reference object
  * (like a broadcast model), and each row pays a single tight
  * byte-loop in generated code.
  *
  * Semantics: counts EVERY occurrence of every pattern, overlapping
  * included — e.g. "aa" occurs 3× in "aaaa", and occurrences of
  * different patterns never mask each other (the output closure over
  * suffix links reports all patterns ending at each position). For a
  * BORDERLESS pattern (no proper prefix that is also a suffix),
  * same-pattern occurrences cannot overlap, so the count coincides
  * with the non-overlapping split count `len(split(text, p)) - 1` —
  * the property the q174 oracle relies on (MiningSpec pins both
  * semantics).
  *
  * Matching is over UTF-8 BYTES: for valid-UTF-8 pattern and text,
  * byte-substring occurrences are exactly character-substring
  * occurrences (no UTF-8 sequence is a prefix of another's tail), so
  * the automaton needs no decoding.
  */
final class AcAutomaton(patterns: Array[Array[Byte]]) extends Serializable {

  require(patterns.forall(_.nonEmpty), "empty pattern")

  val nPatterns: Int = patterns.length

  // one compile per instance (the bounded LRU could otherwise evict
  // between field initializers and recompile the same tables)
  private val tables = AcAutomaton.compile(patterns)

  /** delta(state, byte) flattened to state*256+byte; total states
    * bounded by 1 + Σ pattern lengths. */
  private val delta: Array[Int] = tables._1

  /** Pattern ids ending at each state, suffix-closure included —
    * `outFlat` slices indexed by `outOff(state) until outOff(state+1)`. */
  private val outOff: Array[Int] = tables._2
  private val outFlat: Array[Int] = tables._3

  /** Per-pattern occurrence counts over `bytes` (all positions,
    * overlaps included). */
  def count(bytes: Array[Byte]): Array[Long] = {
    val counts = new Array[Long](nPatterns)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = delta((s << 8) | (bytes(i) & 0xff))
      var j = outOff(s)
      val end = outOff(s + 1)
      while (j < end) { counts(outFlat(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }

  /** Codegen entry point: one call per row from the generated loop. */
  def countArray(text: UTF8String): ArrayData =
    new GenericArrayData(count(text.getBytes))
}

object AcAutomaton {

  /** Memoized compile keyed on pattern content — the expression tree is
    * copied/transformed many times during analysis and each copy's
    * lazy automaton would otherwise rebuild the tables. BOUNDED
    * (round-8 advisor): an access-ordered LRU capped at [[MaxCached]]
    * pattern sets, so a driver that compiles many distinct blocklists
    * over its lifetime cannot retain every O(pattern-bytes × 256)
    * table forever; an evicted set simply recompiles on next use. */
  private val MaxCached = 64
  private val cache =
    new java.util.LinkedHashMap[Seq[Seq[Byte]],
        (Array[Int], Array[Int], Array[Int])](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[Seq[Byte]],
            (Array[Int], Array[Int], Array[Int])]): Boolean =
        size() > MaxCached
    }

  /** Classic construction: byte trie → BFS failure links → full
    * transition table + per-state output closure. */
  private[functions] def compile(patterns: Array[Array[Byte]])
      : (Array[Int], Array[Int], Array[Int]) = cache.synchronized {
    cache.computeIfAbsent(patterns.toSeq.map(_.toSeq), { _ =>
      val maxStates = 1 + patterns.map(_.length).sum
      val children = Array.fill(maxStates * 256)(-1)
      val ends = Array.fill(maxStates)(List.empty[Int])
      var nStates = 1
      patterns.zipWithIndex.foreach { case (p, pid) =>
        var s = 0
        p.foreach { b =>
          val slot = (s << 8) | (b & 0xff)
          if (children(slot) < 0) { children(slot) = nStates; nStates += 1 }
          s = children(slot)
        }
        ends(s) ::= pid
      }
      val fail = new Array[Int](nStates)
      val delta = new Array[Int](nStates * 256)
      val out = new Array[List[Int]](nStates)
      val queue = scala.collection.mutable.Queue.empty[Int]
      out(0) = ends(0)
      var c = 0
      while (c < 256) {
        val ch = children(c)
        if (ch >= 0) { fail(ch) = 0; queue.enqueue(ch); delta(c) = ch }
        else delta(c) = 0
        c += 1
      }
      while (queue.nonEmpty) {
        val s = queue.dequeue()
        out(s) = ends(s) ::: out(fail(s))
        var c = 0
        while (c < 256) {
          val ch = children((s << 8) | c)
          if (ch >= 0) {
            fail(ch) = delta((fail(s) << 8) | c)
            queue.enqueue(ch)
            delta((s << 8) | c) = ch
          } else {
            delta((s << 8) | c) = delta((fail(s) << 8) | c)
          }
          c += 1
        }
      }
      val outOff = new Array[Int](nStates + 1)
      var i = 0
      while (i < nStates) { outOff(i + 1) = outOff(i) + out(i).size; i += 1 }
      val outFlat = new Array[Int](outOff(nStates))
      i = 0
      while (i < nStates) {
        var j = outOff(i)
        out(i).foreach { pid => outFlat(j) = pid; j += 1 }
        i += 1
      }
      (java.util.Arrays.copyOf(delta, nStates * 256), outOff, outFlat)
    })
  }
}

/** `graft_multi_count(text, array('p1', 'p2', ...)) -> array<bigint>` —
  * per-pattern occurrence counts via a shared [[AcAutomaton]]. The
  * pattern array must be FOLDABLE (pinned at plan time): the automaton
  * compiles once when the plan resolves, not per row.
  */
case class MultiMatchCount(text: Expression, patterns: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = patterns

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("text must be STRING")
    else if (!patterns.foldable)
      TypeCheckResult.TypeCheckFailure("patterns must be a literal array")
    else patterns.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("patterns must be ARRAY<STRING>")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_multi_count"

  @transient private lazy val automaton: AcAutomaton = {
    val arr = patterns.eval(null).asInstanceOf[ArrayData]
    new AcAutomaton(Array.tabulate(arr.numElements()) { i =>
      require(!arr.isNullAt(i), "null pattern")
      arr.getUTF8String(i).getBytes
    })
  }

  override protected def nullSafeEval(t: Any, p: Any): Any =
    automaton.countArray(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val auto = ctx.addReferenceObj("acAutomaton", automaton,
        classOf[AcAutomaton].getName)
      s"${ev.value} = $auto.countArray($t);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiMatchCount =
    copy(text = newLeft, patterns = newRight)
}
