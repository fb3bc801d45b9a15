package graft

import graft.queries.{DedupQueries, SimilarityQueries, TextQueries}

/** Pins for the corpus-audit queries (q214 Zipf curve, q218 prefix
  * fidelity, q219 dedup yield curve): fixed-point identities, bucket
  * partition/monotonicity invariants, and the overlap bounds — the
  * properties the DuckDB differential can't state (it proves equality,
  * not sanity of the shared definition). */
class AuditQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q214: rank-1 fit is exactly 1e6; ranks dense; counts nonincreasing") {
    val rows = TextQueries.queries("q214_zipf_curve")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        s"$lang: ranks not dense")
      // zipf_fit at rank 1 is 1e6·n·1/f1 with f1 = n(rank 1)
      assert(sorted.head.getLong(4) == 1000000L, s"$lang: rank-1 fit")
      val ns = sorted.map(_.getLong(3))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
        s"$lang: counts must be nonincreasing in rank")
      // f1/fr ppm is nondecreasing in rank (fr nonincreasing)
      val decay = sorted.map(_.getLong(5))
      assert(decay.zip(decay.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q218: overlap bounded by k; one row per (query, depth)") {
    val rows = SimilarityQueries
      .queries("q218_prefix_fidelity")(spark, dir).collect()
    assert(rows.length == 5 * 3, "NumQueries x PrefixDims")
    rows.foreach { r =>
      val (k, ov, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ov >= 0 && ov <= k)
      assert(ppm == 1000000L * ov / k)
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      == rows.length)
  }

  test("q219: buckets partition the corpus; cumulative uniques are consistent") {
    val rows = DedupQueries.queries("q219_yield_curve")(spark, dir)
      .collect().sortBy(_.getLong(0))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val nUnique = docs.selectExpr("count(DISTINCT md5(text))").head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == nUnique,
      "per-bucket first occurrences must sum to the distinct-fingerprint count")
    // cum columns are exact prefix sums; uniques never exceed docs
    var (cd, cu) = (0L, 0L)
    rows.foreach { r =>
      cd += r.getLong(1); cu += r.getLong(2)
      assert(r.getLong(3) == cd && r.getLong(4) == cu)
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(5) == 1000000L * r.getLong(2) / r.getLong(1))
    }
  }
}
