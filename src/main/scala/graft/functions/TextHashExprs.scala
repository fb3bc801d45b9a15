package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the text-hash hot loops (MinHash
  * signatures, SimHash, rolling-hash fingerprint).
  *
  * Why custom Expressions (builder-prompt preference ladder (b)): the
  * composable renderings in [[graft.operators.Dedup]] /
  * [[TextAnalysis]] are higher-order functions
  * (`transform`/`aggregate`/`array_min`), which Catalyst evaluates
  * INTERPRETED — per-element lambda dispatch, boxed accumulators, one
  * md5 Expression eval per (slot, element). These kernels sit on the
  * per-document hot path of q43/q51/q52/q53 (at 100 TB: every document
  * ever ingested), so each becomes a single JIT'd loop with a
  * thread-local MessageDigest and no intermediate ArrayData.
  *
  * Numeric/semantic contract — each kernel is BIT-IDENTICAL to both the
  * HOF Column form it replaces and the DuckDB oracle rendering derived
  * from the same constants (see the *Sql twins in Dedup/TextAnalysis):
  *  - minhash slot i = lexicographic MIN over lowercase-hex
  *    `md5("i:" ++ element)`; hex order == unsigned digest-byte order,
  *    so the kernel compares raw digests and hexifies winners only.
  *    Null elements are skipped (array_min semantics); an empty or
  *    all-null input yields all-null slots (array_min of empty = null).
  *  - simhash bit i = sign of Σ votes, vote = +1 iff 48-bit token hash
  *    has bit i set else -1; a null element votes -1 on every bit
  *    (CASE WHEN null THEN .. ELSE -1 falls to the ELSE branch).
  *  - fingerprint = left fold `(acc*31 + h48) % 1e9+7` from 0; a null
  *    element nulls the result (null propagates through the +).
  *  - h48 (token hash) = first 12 hex digits of md5 as a long — i.e.
  *    the first 6 digest bytes big-endian.
  */
object TextHashKernels {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".toCharArray

  private val slotPrefixes: Array[Array[Byte]] =
    Array.tabulate(graft.operators.Dedup.NumHashes)(i => s"$i:".getBytes(UTF_8))

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def digest(prefix: Array[Byte], tok: Array[Byte]): Array[Byte] = {
    val d = md.get()
    d.reset()
    if (prefix != null) d.update(prefix)
    d.update(tok)
    d.digest()
  }

  /** 48-bit md5-derived token hash (TextAnalysis.tokenHash semantics). */
  private def h48(tok: UTF8String): Long = {
    val dig = digest(null, tok.getBytes)
    ((dig(0) & 0xffL) << 40) | ((dig(1) & 0xffL) << 32) |
      ((dig(2) & 0xffL) << 24) | ((dig(3) & 0xffL) << 16) |
      ((dig(4) & 0xffL) << 8) | (dig(5) & 0xffL)
  }

  def minhash(sh: ArrayData): ArrayData = {
    val slots = slotPrefixes.length
    val mins = new Array[Array[Byte]](slots)
    val n = sh.numElements()
    var j = 0
    while (j < n) {
      if (!sh.isNullAt(j)) {
        val tok = sh.getUTF8String(j).getBytes
        var i = 0
        while (i < slots) {
          val dig = digest(slotPrefixes(i), tok)
          if (mins(i) == null || unsignedLess(dig, mins(i))) mins(i) = dig
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](slots)
    var i = 0
    while (i < slots) {
      if (mins(i) != null) out(i) = UTF8String.fromString(hex(mins(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  def simhash(toks: ArrayData): Long = {
    val bits = graft.operators.Dedup.SimHashBits
    val votes = new Array[Int](bits)
    val n = toks.numElements()
    var j = 0
    while (j < n) {
      var h = -1L // null-token sentinel (real hashes are 48-bit, ≥ 0)
      if (!toks.isNullAt(j)) h = h48(toks.getUTF8String(j))
      var i = 0
      while (i < bits) {
        if (h >= 0 && (h & (1L << i)) != 0) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var acc = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) acc |= 1L << i
      i += 1
    }
    acc
  }

  /** Distinct character-n-gram set — kernel twin of the HOF form in
    * Dedup.charGrams: substrings of length n at every start position
    * (1-based CODE-POINT semantics, matching Spark `substr` and DuckDB
    * `substr` on multi-byte text); strings shorter than n contribute
    * the whole string once. First-occurrence order (array_distinct). */
  def charGrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePointCount(0, s.length)
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(8, cps))
    if (cps <= n) {
      seen.add(text)
    } else {
      var start = 0 // char index of window start
      var i = 0     // code-point index
      while (i <= cps - n) {
        val end = s.offsetByCodePoints(start, n)
        seen.add(UTF8String.fromString(s.substring(start, end)))
        start = s.offsetByCodePoints(start, 1)
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Word-n-gram shingle set — the kernel twin of the HOF form in
    * Dedup.shingles: len = 0 → [""], len < n → one whole-string
    * shingle, else DISTINCT n-token windows in first-occurrence order
    * (array_distinct semantics); null elements are skipped inside a
    * window's join but still occupy positions (concat_ws semantics). */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    def joined(from: Int, until: Int): UTF8String = {
      val sb = new java.lang.StringBuilder
      var first = true
      var i = from
      while (i < until) {
        if (!toks.isNullAt(i)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i).toString)
          first = false
        }
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
    if (len < n) return new GenericArrayData(Array[Any](joined(0, len)))
    val seen = new java.util.LinkedHashSet[UTF8String](len * 2)
    var i = 0
    while (i <= len - n) {
      seen.add(joined(i, i + n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def fingerprint(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    var acc = 0L
    var j = 0
    while (j < n) {
      if (toks.isNullAt(j)) return null
      acc = (acc * 31L + h48(toks.getUTF8String(j))) % TextAnalysis.fpMod
      j += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Base for the array<string> → T kernels: accepts only array<string>
  * (or bare NULL), evaluates null-safe. Gated via checkInputDataTypes so
  * a mistyped call (e.g. graft_simhash on array<int>) fails analysis
  * with a clear data-type-mismatch message rather than an opaque
  * unresolved-expression error. */
abstract class TextHashExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
}

/** `graft_minhash(array<string>) -> array<string>` — 12-slot MinHash
  * signature, one pass over the shingle set. */
case class MinHashSignatureExpr(child: Expression) extends TextHashExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(in: Any): Any =
    TextHashKernels.minhash(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.minhash($c)")
  override protected def withNewChildInternal(c: Expression): MinHashSignatureExpr =
    copy(child = c)
}

/** `graft_simhash(array<string>) -> bigint` — 16-bit SimHash over the
  * token multiset. */
case class SimHashExpr(child: Expression) extends TextHashExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(in: Any): Any =
    TextHashKernels.simhash(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHashExpr =
    copy(child = c)
}

/** `graft_chargrams(string, n) -> array<string>` — distinct
  * character-n-gram set in one JIT'd pass (n is a literal, pinned at
  * plan time). */
case class CharGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_chargrams n must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_chargrams"
  override protected def nullSafeEval(in: Any): Any =
    TextHashKernels.charGrams(in.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.charGrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharGramsExpr =
    copy(child = c)
}

/** `graft_shingles(array<string>, n) -> array<string>` — distinct
  * word-n-gram shingles in one JIT'd pass (n is a literal, pinned at
  * plan time). */
case class ShinglesExpr(child: Expression, n: Int) extends TextHashExpr {
  require(n >= 1, s"graft_shingles n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override protected def nullSafeEval(in: Any): Any =
    TextHashKernels.shingles(in.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

/** `graft_fingerprint(array<string>) -> bigint` — rolling-hash document
  * fingerprint; null on null input OR null element (the fold's null
  * propagation). */
case class FingerprintExpr(child: Expression) extends TextHashExpr {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fingerprint"
  override protected def nullSafeEval(in: Any): Any =
    TextHashKernels.fingerprint(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Long r = graft.functions.TextHashKernels.fingerprint($c);
       |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): FingerprintExpr =
    copy(child = c)
}
