package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor primitives over an embedding column
  * (builder-prompt extension surface): brute-force cosine top-k as the
  * exactness baseline, and random-hyperplane LSH bucketing as the scale
  * path — at 100 TB the bucket key turns the all-pairs cross join into
  * one hash shuffle on an 8-bit key; multiple independent bucket tables
  * (repeat with a different seed) trade recall for cost.
  *
  * Hyperplanes are deterministic (fixed LCG seed) small-integer vectors
  * embedded as literals in BOTH the Spark plan and the DuckDB oracle, so
  * the sign tests agree bit-for-bit (the underlying dot product uses
  * Dedup.dotProduct's pinned fold order).
  */
object Similarity {

  val Dim = 64
  val NumPlanes = 8

  /** Deterministic pseudo-random hyperplanes: components in [-5, 5]
    * from a 31-bit LCG, seed 20240101. */
  val planes: Seq[Seq[Int]] = {
    var x = 20240101L
    def next(): Long = { x = (x * 1103515245L + 12345L) % 2147483648L; x }
    Seq.fill(NumPlanes)(Seq.fill(Dim)((next() % 11).toInt - 5))
  }

  // float literals: graft_dot takes array<float>; the small-int
  // components are exact in float, so values match the SQL rendering's
  // CAST(c AS DOUBLE).
  private def planeLit(p: Seq[Int]): Column = array(p.map(c => lit(c.toFloat)): _*)

  private def planeLitSql(p: Seq[Int]): String =
    p.map(c => s"CAST($c AS DOUBLE)").mkString("[", ", ", "]")

  /** 8-bit LSH bucket: bit p set iff dot(v, plane_p) > 0. */
  def bucket(v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(Dedup.dotProduct(v, planeLit(p)) > 0.0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  def bucketSql(vE: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${Dedup.dotProductSql(vE, planeLitSql(p))} > 0.0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  /** cosine(a, b) given precomputed norms — one IEEE division of
    * identical operands in both engines. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    Dedup.dotProduct(a, b) / (normA * normB)
}
