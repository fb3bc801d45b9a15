package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom filter over string keys — the broadcast-index
  * scale path for incremental dedup (q91): at 100 TB the history side
  * of "is this batch row already ingested?" cannot be broadcast and
  * must not be shuffled per batch, but a Bloom filter of its key
  * hashes is a few MB of bits that CAN be broadcast, classifies every
  * batch row locally with zero false negatives, and leaves only the
  * bloom-positive sliver (true duplicates + an ε of false positives)
  * for the exact verify join. Generalizes the reference's D2 key-level
  * dedup-at-sink semantics (`dags/dag.py:389-403`) the same way q67
  * does, swapping the broadcast side.
  *
  * Determinism contract (what makes the filter ORACLE-ABLE): bit
  * positions are md5-derived — position j of key s = the 48-bit
  * [[TextAnalysis.tokenHash]]-style integer of `md5("j:" ++ s)`
  * mod `m` — so the DuckDB twin can recompute the EXACT bit set as a
  * distinct-positions relation and membership as a positions
  * semi-join: `bloom_positive(s) ⇔ ∀j: pos_j(s) ∈ bits` is literally
  * the bit-array test re-expressed relationally. No RNG, no
  * JVM-hash-dependence, bit-stable across partitionings (merge is a
  * bytewise OR — associative, commutative, idempotent).
  *
  * Sizing: the standard formulas, exposed as [[Bloom.bitsFor]] /
  * [[Bloom.hashesFor]] — m = ceil(-n·ln p / ln²2) bits for target
  * false-positive rate p at n keys, k = round(m/n·ln 2) hashes. The
  * fixture default (m = 8192 bits = 1 KiB, k = 4) holds the ~250-key
  * fixture history at FPR ≈ 2·10⁻⁴; 10⁹ keys at 1 % wants ~1.2 GB —
  * still one broadcast, vs re-shuffling 10⁹ history hashes per batch.
  */
object Bloom {

  /** Fixture-scale defaults: 8192 bits / 4 hashes (see sizing above). */
  val DefaultBits = 8192
  val DefaultHashes = 4

  /** m for target FPR `p` at `n` keys: ceil(-n ln p / ln²2). */
  def bitsFor(n: Long, p: Double): Long = {
    require(n > 0 && p > 0 && p < 1, s"need n > 0, 0 < p < 1; got n=$n p=$p")
    val ln2 = math.log(2.0)
    math.ceil(-n * math.log(p) / (ln2 * ln2)).toLong
  }

  /** Optimal hash count for m bits over n keys: round(m/n ln 2), ≥ 1. */
  def hashesFor(m: Long, n: Long): Int =
    math.max(1, math.round(m.toDouble / n * math.log(2.0))).toInt

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Bit position j of key `s`: first 6 bytes of md5("j:" ++ s) as a
    * big-endian 48-bit int (the [[TextAnalysis.tokenHash]] construction,
    * = `CAST('0x' || substr(md5(j || ':' || s), 1, 12) AS BIGINT)` in
    * DuckDB), mod m. */
  def position(j: Int, s: UTF8String, m: Int): Int = {
    val d = md.get()
    d.reset()
    d.update(s"$j:".getBytes(UTF_8))
    d.update(s.getBytes)
    val dig = d.digest()
    val h48 = ((dig(0) & 0xffL) << 40) | ((dig(1) & 0xffL) << 32) |
      ((dig(2) & 0xffL) << 24) | ((dig(3) & 0xffL) << 16) |
      ((dig(4) & 0xffL) << 8) | (dig(5) & 0xffL)
    (h48 % m).toInt
  }

  def add(bits: Array[Byte], s: UTF8String, m: Int, k: Int): Unit = {
    var j = 0
    while (j < k) {
      val p = position(j, s, m)
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
      j += 1
    }
  }

  /** Membership test — callable from generated code (q91's per-row hot
    * path: k md5s per batch row, no join, no shuffle). */
  def contains(bits: Array[Byte], s: UTF8String, m: Int, k: Int): Boolean = {
    var j = 0
    while (j < k) {
      val p = position(j, s, m)
      if ((bits(p >>> 3) & (1 << (p & 7))) == 0) return false
      j += 1
    }
    true
  }

  /** DuckDB rendering of [[position]] for the oracle's positions
    * relation (`jE` = the hash index expression, `sE` = the key). */
  def positionSql(jE: String, sE: String, m: Int): String =
    s"CAST('0x' || substr(md5(CAST($jE AS VARCHAR) || ':' || $sE), 1, 12) AS BIGINT) % $m"

  /** Union of two same-size filters (bytewise OR) — the driver-side
    * fold a streaming ingest uses to absorb each admitted batch into
    * its index (see StreamingIngest.admitNovelTexts). */
  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"bloom size mismatch: ${a.length} vs ${b.length} bytes")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) | b(i)).toByte; i += 1 }
    out
  }
}

/** `graft_bloom(string[, m, k]) -> binary` — aggregates keys into an
  * m-bit Bloom filter (m/8 bytes). The aggregation buffer is CONSTANT
  * SIZE regardless of input cardinality, partials are computed
  * map-side, and `merge` is a bytewise OR — associative, commutative
  * and idempotent, so the result is bit-stable under any partitioning,
  * shuffle order, or AQE re-plan (pinned in AggregatesSpec). NULL keys
  * are skipped (COUNT-style semantics). */
case class BloomAgg(
    child: Expression,
    m: Int = Bloom.DefaultBits,
    k: Int = Bloom.DefaultHashes,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(m >= 8 && m % 8 == 0, s"graft_bloom m must be a positive multiple of 8, got $m")
  require(k >= 1, s"graft_bloom k must be >= 1, got $k")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, v.asInstanceOf[UTF8String], m, k)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      buf(i) = (buf(i) | other(i)).toByte
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): BloomAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAgg =
    copy(inputAggBufferOffset = n)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `graft_bloom_contains(binary, string[, m, k]) -> boolean` — Bloom
  * membership test; (m, k) must match the filter's build parameters.
  * Codegen'd: each batch row costs k md5s against a broadcast byte
  * array — no join, no shuffle, no false negatives. */
case class BloomContainsExpr(
    left: Expression, right: Expression,
    m: Int = Bloom.DefaultBits, k: Int = Bloom.DefaultHashes)
  extends BinaryExpression with BinaryLike[Expression] {

  require(m >= 8 && m % 8 == 0, s"graft_bloom_contains m must be a positive multiple of 8, got $m")
  require(k >= 1, s"graft_bloom_contains k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | NullType, StringType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bits: Any, key: Any): Any =
    Bloom.contains(bits.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, s) =>
      s"graft.functions.Bloom.contains($b, $s, $m, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
}
