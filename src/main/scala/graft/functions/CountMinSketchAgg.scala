package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Count-Min Sketch over string keys (Cormode &
  * Muthukrishnan 2005) — point-frequency estimates in CONSTANT memory,
  * the sketch a 100 TB pipeline uses for heavy-hitter questions
  * ("how often does this token/domain appear?") where an exact groupBy
  * over the full key universe would shuffle billions of distinct keys.
  * The aggregation buffer is a fixed d×w counter grid regardless of
  * input cardinality, partials combine map-side, and `merge` is
  * element-wise sum — associative and commutative, so the sketch is
  * bit-stable under any partitioning (same contract as [[BloomAgg]] /
  * [[HllSketchAgg]]).
  *
  * Determinism contract (what makes the sketch ORACLE-ABLE, the same
  * move as [[Bloom]]): row j's counter index for key s is the
  * md5-derived [[Bloom.position]] (j, s, w), so the DuckDB twin can
  * recompute every cell as a GROUP BY over (j, position) and the
  * estimate as min over the key's d cells — the counter grid
  * re-expressed relationally. estimate ≥ true count ALWAYS (counters
  * only ever over-count collisions — the one-sided CMS guarantee is
  * deterministic, not probabilistic, and q94's oracle hash-verifies
  * it as a literal-true column).
  *
  * Sizing: error ≤ e·N/w with probability 1−(1/2)^d over the hash
  * draw; the fixture default (d = 4 rows × w = 2048 counters = 64 KiB)
  * holds the ~60 k-token fixture corpus at ≲ 2 % of N per collision
  * row. At 100 TB: w grows with N/targetError (still MBs), d stays
  * small — one broadcast, vs a full-universe exact aggregation.
  */
object Cms {

  /** Fixture-scale defaults: 4 rows × 2048 counters (64 KiB). */
  val DefaultDepth = 4
  val DefaultWidth = 2048

  def add(grid: Array[Long], s: UTF8String, d: Int, w: Int): Unit = {
    var j = 0
    while (j < d) {
      grid(j * w + Bloom.position(j, s, w)) += 1L
      j += 1
    }
  }

  /** min over the key's d cells, read directly from the serialized
    * big-endian grid — callable from generated code; d probes of
    * 8 bytes each, no buffer decode. */
  def estimate(bytes: Array[Byte], s: UTF8String, d: Int, w: Int): Long = {
    var est = Long.MaxValue
    var j = 0
    while (j < d) {
      val off = (j * w + Bloom.position(j, s, w)) * 8
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
      if (v < est) est = v
      j += 1
    }
    est
  }

  def serialize(grid: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](grid.length * 8)
    var i = 0
    while (i < grid.length) {
      var v = grid(i)
      var b = 7
      while (b >= 0) { out(i * 8 + b) = (v & 0xff).toByte; v >>>= 8; b -= 1 }
      i += 1
    }
    out
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) {
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (bytes(i * 8 + b) & 0xffL); b += 1 }
      out(i) = v
      i += 1
    }
    out
  }
}

/** `graft_cms(string[, d, w]) -> binary` — aggregates key occurrences
  * (multiset semantics) into a d×w Count-Min grid, serialized as
  * big-endian longs. NULL keys are skipped. */
case class CmsAgg(
    child: Expression,
    d: Int = Cms.DefaultDepth,
    w: Int = Cms.DefaultWidth,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(d >= 1 && w >= 1, s"graft_cms needs d >= 1, w >= 1; got d=$d w=$w")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Cms.add(buf, v.asInstanceOf[UTF8String], d, w)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = Cms.serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): CmsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsAgg =
    copy(inputAggBufferOffset = n)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}

/** `graft_cms_est(binary, string[, d, w]) -> bigint` — point-frequency
  * estimate; (d, w) must match the sketch's build parameters.
  * Codegen'd: d md5 probes against the broadcast grid per row. */
case class CmsEstExpr(
    left: Expression, right: Expression,
    d: Int = Cms.DefaultDepth, w: Int = Cms.DefaultWidth)
  extends BinaryExpression with BinaryLike[Expression] {

  require(d >= 1 && w >= 1, s"graft_cms_est needs d >= 1, w >= 1; got d=$d w=$w")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | NullType, StringType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_est"

  override protected def nullSafeEval(bytes: Any, key: Any): Any =
    Cms.estimate(bytes.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String], d, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, s) =>
      s"graft.functions.Cms.estimate($b, $s, $d, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstExpr =
    copy(left = newLeft, right = newRight)
}
