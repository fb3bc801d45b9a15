package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY.md §7.4's anticipated custom aggregate):
  * element-wise mean of `Array[Float]` embeddings — the centroid step of
  * IVF training / cluster summarization. Merge-associative partial
  * aggregation: each partition folds locally (sum vector + count), then
  * partials merge — the map-side-combine shape that keeps a 100 TB
  * groupBy from shuffling raw vectors.
  *
  * Usable typed (`ds.groupByKey(...).agg(CentroidAggregator.toColumn)`)
  * or untyped via `functions.udaf` registration (see ExtensionsSpec).
  */
object CentroidAggregator extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(acc: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) acc
    else {
      val sums = if (acc._1.isEmpty) new Array[Double](v.length) else acc._1
      var i = 0
      while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
      (sums, acc._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length && i < b._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(acc: (Array[Double], Long)): Array[Double] =
    if (acc._2 == 0) Array.empty[Double] else acc._1.map(_ / acc._2)

  private val arrEnc: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(arrEnc, Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = arrEnc
}
