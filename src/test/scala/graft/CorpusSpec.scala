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

  test("q116 shard manifest: two-level prefix sum equals the naive global scan") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q116_shard_manifest")(spark, dir)
      .select("doc_id", "n_tokens", "start_tok", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver-side reference: ONE global scan in (md5, doc_id) order
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = {
      md.reset()
      md.digest(s"shard:$id".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }
    var cum = 0L
    val ref = rows.map(r => (h(r._1), r._1, r._2)).sortBy(t => (t._1, t._2))
      .map { case (_, id, n) => val s = cum; cum += n; id -> s }.toMap
    for ((id, n, start, shard) <- rows) {
      assert(start == ref(id), s"doc $id: start $start != global-scan ${ref(id)}")
      assert(shard == start / CorpusQueries.ShardTokens)
      assert(n >= 0L)
    }
    // greedy packing bound: a shard holds < cap + its largest doc
    val maxDoc = rows.map(_._2).max
    rows.groupBy(_._4).foreach { case (sh, ds) =>
      val tot = ds.map(_._2).sum
      assert(tot < CorpusQueries.ShardTokens + maxDoc,
        s"shard $sh overpacked: $tot tokens")
    }
  }

  test("q118 selection pipeline: slice exclusions, packing law, prefix-sum consistency") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q118_selection_pipeline")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // the DSIR target slice and the benchmark-doc slice never train
    for ((id, n, _, _, _) <- rows) {
      assert(id % 10 != 0, s"target-slice doc $id leaked into the manifest")
      assert(id % 13 != 0, s"benchmark doc $id leaked into the manifest")
      assert(n > 0)
    }
    // survivors' start_toks are the exact prefix sum of the survivor
    // set in content-addressed global order, and shard obeys the law
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = {
      md.reset()
      md.digest(s"shard:$id".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }
    var cum = 0L
    val ref = rows.map(r => (h(r._1), r._1, r._2)).sortBy(t => (t._1, t._2))
      .map { case (_, id, n) => val s = cum; cum += n; id -> s }.toMap
    for ((id, _, _, start, shard) <- rows) {
      assert(start == ref(id), s"doc $id: start $start != ${ref(id)}")
      assert(shard == start / CorpusQueries.ShardTokens)
    }
    // the median gate keeps at least half of what it ranked: every
    // kept avg_iw is >= the smallest kept one by construction, and the
    // kept set is not degenerate (more than a third of the raw pool
    // after the two slice exclusions at this SF)
    assert(rows.length > 450 / 3, s"only ${rows.length} survivors")
  }

  test("q122 curriculum: dense positions, monotone difficulty, conserves the manifest") {
    val dir = "/root/testdata/sf0.001"
    val manifest = SparkEntry.queries("q118_selection_pipeline")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(4))) // (n_tokens, shard)
    val rows = SparkEntry.queries("q122_curriculum")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // positions are 1..n in order
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    // curriculum = easiest (highest mean importance) first
    val means = rows.map(_._5)
    assert(means.zip(means.tail).forall { case (a, b) => a >= b },
      "mean_iw must be non-increasing along curriculum order")
    // shard set, doc counts, and token totals conserve the manifest
    val wantByShard = manifest.groupBy(_._2)
      .map { case (sh, ds) => sh -> ((ds.length.toLong, ds.map(_._1).sum)) }
    val gotByShard = rows.map(r => r._2 -> ((r._3, r._4))).toMap
    assert(gotByShard == wantByShard)
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

  test("q153 packing: layout arithmetic consistent, stream gapless, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = CorpusQueries.queries("q153_sequence_packing")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val rows = run()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, st, sf, sl, off, ns) =>
      assert(n >= 1, s"doc $id: empty doc emitted")
      assert(sf == st / 512 && sl == (st + n - 1) / 512 && off == st % 512,
        s"doc $id: sequence arithmetic inconsistent")
      assert(ns == sl - sf + 1 && ns >= 1, s"doc $id: n_seqs wrong")
      // a doc spanning k sequences has > (k-2) full windows of tokens
      assert(n > (ns - 2) * 512, s"doc $id: n_seqs=$ns impossible for n=$n")
    }
    // nonempty docs tile the token stream contiguously: sorted by
    // start_tok, each doc begins where the previous ended
    val byStart = rows.sortBy(_._3)
    assert(byStart.head._3 == 0L)
    byStart.sliding(2).foreach {
      case Array((_, n1, s1, _, _, _, _), (_, _, s2, _, _, _, _)) =>
        assert(s1 + n1 == s2, "token stream has a gap or overlap")
      case _ =>
    }
    assert(run().toSeq == rows.toSeq)
  }

  test("q155 preference pairs: distinct docs, non-negative margin, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = CorpusQueries.queries("q155_preference_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val rows = run()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, src, ng, cid, cs, rid, rs, m) =>
      assert(ng >= 2, s"($lang,$src): group of $ng emitted")
      assert(cid != rid, s"($lang,$src): chosen == rejected")
      assert(m == cs - rs && m >= 0, s"($lang,$src): bad margin")
      assert(cs <= 1000000L && rs >= 0L, s"($lang,$src): score out of range")
    }
    assert(run().toSeq == rows.toSeq)
  }

  test("q156 sliding chunks: stride grid tiles each doc, ragged tail kept") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusQueries.queries("q156_sliding_chunks")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "size(filter(split(lower(trim(text)), '\\\\s+'), t -> t != ''))")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val n = nTok(id)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until cs.length.toLong),
        s"doc $id: chunk_idx not dense")
      assert(cs.length.toLong == (n - 1) / 96 + 1, s"doc $id: chunk count")
      sorted.foreach { case (_, i, st, len) =>
        assert(st == i * 96, s"doc $id chunk $i: start off-grid")
        assert(len == math.min(st + 128, n) - st && len >= 1,
          s"doc $id chunk $i: bad length")
      }
      assert(sorted.last._3 + sorted.last._4 == n, s"doc $id: tail not covered")
    }
  }

  test("q157 shared prefixes: reuse accounting consistent, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = CorpusQueries.queries("q157_shared_prefixes")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val rows = run()
    rows.foreach { case (h, nd, pl, sv, _) =>
      assert(nd >= 2, "singleton group emitted")
      assert(pl >= 1 && pl <= 16, s"prefix_len $pl out of range")
      assert(sv == (nd - 1) * pl, "saved_tokens accounting")
      assert(h.length == 32)
    }
    assert(rows.map(_._1).distinct.length == rows.length, "prefix_hash not unique")
    assert(run().toSeq == rows.toSeq)
  }

  test("q172 data card: stratum stats conserve the corpus, median inside the range") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusQueries.queries("q172_data_card")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val eligible = spark.read.parquet(s"$dir/documents.parquet")
      .where(size(split(lower(trim(col("text"))), "\\s+")) >= 1)
      .where(length(trim(col("text"))) > 0)
    assert(rows.map(_._3).sum == eligible.count(), "strata must conserve docs")
    rows.foreach { case (lang, src, nd, tt, mean, dup, p50) =>
      assert(mean == tt / nd, s"($lang,$src): mean arithmetic")
      assert(dup >= 0 && dup < 1000000L, s"($lang,$src): dup_ppm range")
      assert(p50 % 16 == 0 && p50 >= 0 && p50 <= 1024, s"($lang,$src): p50 bin")
    }
  }

  test("q171 consensus: keep iff at least 3 of the 4 gates pass") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusQueries.queries("q171_quality_consensus")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, a, b, c, d, cons, keep) =>
      val n = Seq(a, b, c, d).count(identity).toLong
      assert(cons == n, s"doc $id: consensus $cons vs gates $n")
      assert(keep == (n >= 3), s"doc $id: keep verdict")
    }
    // the vote is non-degenerate on the fixture: some docs fail
    assert(rows.exists(!_._7) && rows.exists(_._7))
  }

  test("q167 attribution: verdict consistent with its two counters, bench excluded") {
    val dir = "/root/testdata/sf0.001"
    def run() = CorpusQueries.queries("q167_contamination_attribution")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val rows = run()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nsg, nnb, v) =>
      assert(id % 13 != 0, s"benchmark doc $id leaked into the report")
      val want =
        if (nsg > 0 && nnb > 0) "both"
        else if (nsg > 0) "ngram"
        else if (nnb > 0) "embedding"
        else "clean"
      assert(v == want, s"doc $id: verdict $v vs counters ($nsg, $nnb)")
    }
    val nNonBench = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 13 =!= 0).count()
    assert(rows.length.toLong == nNonBench, "every non-benchmark doc reports")
    assert(run().toSeq == rows.toSeq)
  }

  test("q165 gate: per-language threshold is the histogram median bucket floor") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusQueries.queries("q165_lang_quality_gate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val thr = rs.map(_._4).distinct
      assert(thr.length == 1, s"$lang: threshold not constant per language")
      val t = thr.head
      assert(t % 10000 == 0, s"$lang: threshold not a bucket floor")
      val n = rs.length
      // the median-bucket property on the bucketed scores
      val atOrAbove = rs.count { case (_, _, s, _, _) => s / 10000 >= t / 10000 }
      val below = rs.count { case (_, _, s, _, _) => s / 10000 < t / 10000 }
      assert(below * 2 < n, s"$lang: more than half strictly below the median bucket")
      assert((n - atOrAbove) * 2 < n || atOrAbove * 2 >= n, s"$lang: median property")
      rs.foreach { case (id, _, s, _, keep) =>
        assert(keep == (s >= t), s"doc $id: verdict mismatch") }
    }
  }

  test("q166 padding: buckets conserve docs and tokens, waste arithmetic exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusQueries.queries("q166_padding_waste")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val ladder = Set(64L, 128L, 256L, 512L, 4096L)
    rows.foreach { case (cap, nd, real, padded, ppm) =>
      assert(ladder.contains(cap), s"unknown bucket cap $cap")
      assert(padded == nd * cap && real <= padded, s"cap $cap: padding accounting")
      assert(ppm == 1000000L * (padded - real) / padded, s"cap $cap: waste ppm")
    }
    val nEligible = spark.read.parquet(s"$dir/documents.parquet")
      .where(size(split(lower(trim(col("text"))), "\\s+")) >= 1)
      .where(length(trim(col("text"))) > 0).count()
    assert(rows.map(_._2).sum == nEligible, "bucket populations must conserve docs")
  }

  test("q152 FIM: spans nonempty and conserving, short docs skipped, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = CorpusQueries.queries("q152_fim_splits")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    val rows = run()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, c1, c2, lp, lm, ls, h) =>
      assert(n >= 8L, s"doc $id: under-min doc emitted (n=$n)")
      assert(1L <= c1 && c1 < c2 && c2 <= n - 1,
        s"doc $id: cut points out of range (n=$n c1=$c1 c2=$c2)")
      assert(lp == c1 && lm == c2 - c1 && ls == n - c2,
        s"doc $id: span lengths inconsistent")
      assert(lp >= 1 && lm >= 1 && ls >= 1, s"doc $id: empty span")
      assert(h.length == 32, s"doc $id: psm_hash not an md5 hex")
    }
    // every eligible doc emits exactly one row
    val eligible = spark.read.parquet(s"$dir/documents.parquet")
      .where(size(split(lower(trim(col("text"))), "\\s+")) >= 8).count()
    assert(rows.length.toLong == eligible)
    assert(run().toSeq == rows.toSeq)
  }
}
