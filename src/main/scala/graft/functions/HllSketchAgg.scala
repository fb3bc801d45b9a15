package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, NullType}

/** `graft_approx_distinct(bigint) -> bigint` — HyperLogLog distinct
  * sketch as a custom `TypedImperativeAggregate` (SURVEY.md §7.4's
  * sketch-based-distinct item; the standalone analog of the built-in
  * `approx_count_distinct`, built from the published HLL construction:
  * Flajolet et al. 2007, with the standard linear-counting small-range
  * correction).
  *
  * Why this shape at 100 TB: the aggregation buffer is a CONSTANT
  * 4 KiB register array per group regardless of input cardinality, the
  * per-partition partial is computed map-side, and `merge` is
  * element-wise register max — associative, commutative, and
  * order-free, so the estimate is bit-stable under any partitioning /
  * shuffle order / AQE re-plan (ExtensionsSpec pins this). That
  * determinism is also what lets q46's within-bound boolean be oracled
  * as literal TRUE.
  *
  * Registers: p = 12 → m = 4096, standard error ≈ 1.04/√m ≈ 1.6 %.
  * Hash: splitmix64 finalizer over the input long — full-avalanche,
  * public-domain constants.
  */
case class HllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllSketchAgg._

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllSketchAgg.add(buf, v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    })
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if ((other(i) & 0xff) > (buf(i) & 0xff)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = HllSketchAgg.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_approx_distinct"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint/int, got ${other.catalogString}")
  }
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

object HllSketchAgg {
  val P = 12
  val M = 1 << P
  val Alpha = 0.7213 / (1.0 + 1.079 / M)

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Registers a value into an M-byte register array (shared by the
    * aggregate's update and the streaming tracker). */
  def add(buf: Array[Byte], value: Long): Unit = {
    val h = mix(value)
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank = (if (w == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > (buf(idx) & 0xff)) buf(idx) = rank.toByte
  }

  /** The HLL estimate (with the small-range linear-counting
    * correction) from an M-byte register array. */
  def estimate(buf: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = buf(i) & 0xff
      sum += java.lang.Math.scalb(1.0, -r) // 2^-r exactly
      if (r == 0) zeros += 1
      i += 1
    }
    val e = Alpha * M.toDouble * M.toDouble / sum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else e
    math.round(corrected)
  }
}

/** `graft_hll(key)` — the same sketch evaluated to its RAW M-byte
  * register array instead of the estimate, for callers that fold
  * sketches across jobs or triggers (the streaming distinct tracker):
  * registers merge by element-wise max at any grouping, the estimate
  * is read once at the end via [[HllSketchAgg.estimate]]. */
case class HllRegistersAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllSketchAgg._

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllSketchAgg.add(buf, v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    })
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if ((other(i) & 0xff) > (buf(i) & 0xff)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = n)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint/int, got ${other.catalogString}")
  }
  override protected def withNewChildInternal(newChild: Expression): HllRegistersAgg =
    copy(child = newChild)
}
