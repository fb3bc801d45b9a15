package graft

import org.apache.spark.sql.functions._
import graft.queries.CorpusQueries

/** q115 DSIR-style importance weighting: the signal the fixture's
  * homogeneous synthetic text cannot exercise — documents that look
  * like the target (reference-slice) distribution must outrank
  * gibberish — plus the structural output contract.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("importance weights rank target-like raw docs above gibberish") {
    val english = "the quick brown fox jumps over the lazy dog and runs home"
    // target slice: doc_id % 10 == 0, all English-like
    val target = (0 until 5).map(i => (i * 10L, english))
    // raw pool: 5 English-like, 5 gibberish (disjoint token space)
    val rawEn = (0 until 5).map(i => (i * 10L + 1, english))
    val rawGib = (0 until 5).map(i =>
      (i * 10L + 2, s"zzq$i xxv$i qqw$i vvz$i wwx$i yyk$i"))
    val out = CorpusQueries.importanceWeights(
        (target ++ rawEn ++ rawGib).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // only raw-pool docs appear
    assert(out.keySet == (rawEn ++ rawGib).map(_._1).toSet)
    val enMin = rawEn.map(d => out(d._1)).min
    val gibMax = rawGib.map(d => out(d._1)).max
    assert(enMin > gibMax,
      s"English-like docs ($enMin) must outrank gibberish ($gibMax)")
    // gibberish never seen in the target slice: strictly negative
    // contrast (raw-probability mass only)
    assert(gibMax < 0L)
  }

  test("importance weights: linear output, n_tokens exact, iw bounded") {
    val docsDf = Seq(
      (0L, "alpha beta gamma"), // target slice
      (1L, "alpha beta"), (2L, ""), (3L, "delta delta delta delta"))
      .toDF("doc_id", "text")
    val rows = CorpusQueries.importanceWeights(docsDf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(1L)._1 == 2L && byId(2L)._1 == 0L && byId(3L)._1 == 4L)
    assert(byId(2L)._2 == 0L, "empty doc scores 0")
    for ((id, (n, iw)) <- byId)
      assert(math.abs(iw) <= n * 1000000L, s"doc $id: |iw|=$iw exceeds n·1e6")
  }
}
