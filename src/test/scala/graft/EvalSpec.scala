package graft

import org.apache.spark.sql.functions._
import graft.queries.EvalQueries

/** Pins for the eval family (q194–q243): confusion-matrix mass
  * conservation, risk–coverage monotonicity, the OLS denominator's
  * closed form, purity's pigeonhole bound, the temporal split's
  * train/test exclusivity, brute-force recomputes of the AUC
  * U-statistic and the PRF/kappa report, and q243's identity-
  * temperature ≡ q237 ECE anchor. */
class EvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q194: matrix mass equals the vector count; rows share to ~1e6") {
    val rows = EvalQueries.queries("q194_centroid_classifier")(spark, dir)
      .collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nVecs)
    rows.groupBy(_.getLong(0)).foreach { case (label, rs) =>
      val total = rs.map(_.getLong(3)).sum
      // integer-floor shares: within |row| of 1e6 from below
      assert(total <= 1000000L && total > 1000000L - rs.length,
        s"label $label shares sum to $total")
    }
  }

  test("q195: coverage and acceptance are monotone nonincreasing in the threshold") {
    val rows = EvalQueries.queries("q195_risk_coverage")(spark, dir)
      .collect().sortBy(_.getLong(0))
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.head.getLong(0) == 0L && rows.head.getLong(1) == nVecs,
      "threshold 0 must accept everything")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) <= a.getLong(1))
      assert(b.getLong(2) <= a.getLong(2))
    }
    rows.foreach { r =>
      assert(r.getLong(3) == -1L || r.getLong(3) <= 1000000L)
    }
  }

  test("q196: the OLS denominator matches its closed form n^2(n^2-1)/12") {
    val rows = EvalQueries.queries("q196_trend_slope")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(3) == n * n * (n * n - 1) / 12,
        s"${r.getString(0)}: den ${r.getLong(3)}")
      val num = r.getLong(2)
      val dirn = r.getLong(4)
      assert(dirn == java.lang.Long.signum(num).toLong)
    }
  }

  test("q197: bucket populations cover all vectors; purity respects the pigeonhole bound") {
    val rows = EvalQueries.queries("q197_bucket_purity")(spark, dir)
      .collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nVecs)
    rows.foreach { r =>
      val (n, topN, purity) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(topN <= n && purity == 1000000L * topN / n)
      // majority over 10 labels is at least a tenth of the bucket
      assert(10 * topN >= n)
    }
  }

  test("q199: radii are non-increasing (the Gonzalez invariant); centers distinct") {
    val rows = EvalQueries.queries("q199_kcenter_coreset")(spark, dir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 8)
    assert(rows.map(_.getLong(1)).distinct.length == 8)
    // the seed is the smallest vec_id
    val minId = spark.read.parquet(s"$dir/embeddings.parquet")
      .agg(min("vec_id")).collect()(0).getLong(0)
    assert(rows.head.getLong(1) == minId && rows.head.getLong(2) == -1L)
    // max-min-distance shrinks (or holds) as the chosen set grows
    rows.drop(1).sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) <= a.getLong(2),
        s"radius grew: ${a.getLong(2)} -> ${b.getLong(2)}")
    }
  }

  test("q201: deciles are balanced and partition the users; lift averages to ~1") {
    val rows = EvalQueries.queries("q201_decile_lift")(spark, dir).collect()
    assert(rows.length == 10)
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "NTILE must balance within 1")
    // weighted mean of lift over users with conversions is 1e6 by
    // construction: sum over deciles of n_converted*all_users scaled
    val conv = rows.map(_.getLong(2)).sum
    assert(conv > 0)
  }

  test("q202: mutual pairs are disjoint (a vector has one nearest neighbor)") {
    val rows = EvalQueries.queries("q202_mutual_nn")(spark, dir).collect()
    assert(rows.nonEmpty)
    val members = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(members.distinct.length == members.length,
      "a vector cannot be in two mutual-NN pairs")
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("q198: test mass equals the second-half transitions; accuracy bounded") {
    val rows = EvalQueries.queries("q198_markov_eval")(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent recount of second-half transitions per type
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t", "event_id")
    val tr = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_millis(ts)").as("t"),
        expr("unix_millis(ts) div 86400000").as("d"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .withColumn("next_d", lead("d", 1).over(w))
      .where(col("next_type").isNotNull)
      .select("event_type", "d", "next_d")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d0 = tr.map(_._2).min
    val d1 = tr.map(t => math.max(t._2, t._3)).max
    val mid = (d0 + d1) / 2
    val expected = tr.filter(_._2 > mid).groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == expected(r.getString(0)), r.getString(0))
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(4) == 1000000L * r.getLong(3) / r.getLong(2))
    }
  }

  test("q215: windowless rank moments reproduce the naive global-rank Spearman") {
    val rows = EvalQueries.queries("q215_rank_correlation")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(5))).toMap
    // independent reconstruction: tie-averaged ranks via the NAIVE
    // per-source windows (min-rank + cnt ⇒ avg·2), then Pearson corr
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val base = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("source"), col("n_chars").as("x"),
        size(graft.functions.TextAnalysis.tokens(col("text")))
          .cast("long").as("y"))
      .withColumn("rx2", lit(2) * rank().over(w.orderBy("x")) +
        count(lit(1)).over(w.partitionBy("source", "x")) - 1)
      .withColumn("ry2", lit(2) * rank().over(w.orderBy("y")) +
        count(lit(1)).over(w.partitionBy("source", "y")) - 1)
    val naive = base.groupBy("source")
      .agg(corr(col("rx2").cast("double"), col("ry2").cast("double"))
        .as("rho"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rows.keySet == naive.keySet)
    rows.foreach { case (src, ppm) =>
      assert(math.abs(ppm / 1e6 - naive(src)) < 1e-5,
        s"$src: $ppm vs ${naive(src)}")
    }
  }

  test("q237: per-bin gaps fold to the exact driver-side ECE") {
    val rows = EvalQueries.queries("q237_reliability")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // independent driver-side fold over the SAME margin frame (the
    // margin itself is differentially certified through q195)
    val m = EvalQueries.margins(spark, dir).collect()
      .map(r => (r.getLong(0) == r.getLong(1), r.getLong(2)))
    val byBin = m.groupBy { case (_, conf) => math.min(conf / 100000L, 9L) }
    val want = byBin.toSeq.sortBy(_._1).map { case (bin, xs) =>
      val n = xs.length.toLong
      val corr = xs.count(_._1).toLong
      val sumConf = xs.map(_._2).sum
      (bin, n, corr, 1000000L * corr / n, sumConf / n)
    }
    val gap = byBin.values.map { xs =>
      math.abs(1000000L * xs.count(_._1) - xs.map(_._2).sum)
    }.sum
    val ece = gap / m.length
    assert(rows.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq == want)
    assert(rows.forall(_._6 == ece), s"ece ${rows.head._6} vs $ece")
    assert(rows.map(_._2).sum == m.length.toLong) // every prediction binned
    rows.foreach { r =>
      assert(r._4 >= 0 && r._4 <= 1000000 && r._5 >= 0 && r._5 <= 1000000)
    }
  }

  test("q241: histogram U-statistic reproduces the brute-force pairwise AUC") {
    val row = EvalQueries.queries("q241_margin_auc")(spark, dir).collect()(0)
    // independent O(n²) recompute over the SAME margin frame: count
    // (pos, neg) pairs where the positive out-margins the negative,
    // half credit on ties — the definition q241's histogram fold
    // decomposes
    val m = EvalQueries.margins(spark, dir).collect()
      .map(r => (r.getLong(0) == r.getLong(1), r.getLong(2)))
    val pos = m.filter(_._1).map(_._2)
    val neg = m.filterNot(_._1).map(_._2)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(row.getLong(0) == pos.length.toLong)
    assert(row.getLong(1) == neg.length.toLong)
    assert(row.getLong(2) == u2, s"u2 ${row.getLong(2)} vs brute $u2")
    assert(row.getLong(3) ==
      1000000L * u2 / (2L * pos.length * neg.length))
    assert(row.getLong(3) >= 0 && row.getLong(3) <= 1000000L)
  }

  test("q242: per-label PRF and kappa match a brute confusion recompute") {
    val rows = EvalQueries.queries("q242_label_prf")(spark, dir).collect()
    val m = EvalQueries.margins(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nAll = m.length.toLong
    assert(rows.map(_.getLong(1)).sum == nAll, "support partitions N")
    rows.foreach { r =>
      val l = r.getLong(0)
      val (sup, prd, tp) = (m.count(_._1 == l).toLong,
        m.count(_._2 == l).toLong, m.count(x => x._1 == l && x._2 == l).toLong)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((sup, prd, tp)))
      assert(tp <= math.min(sup, prd))
      if (prd > 0) assert(r.getLong(4) == 1000000L * tp / prd)
      if (sup > 0) assert(r.getLong(5) == 1000000L * tp / sup)
      if (sup + prd > 0) assert(r.getLong(6) == 2000000L * tp / (prd + sup))
    }
    // kappa: chance-corrected accuracy from the same marginals
    val labs = rows.map(_.getLong(0))
    val tpSum = rows.map(_.getLong(3)).sum
    val pe = labs.map(l => m.count(_._1 == l).toLong * m.count(_._2 == l)).sum
    val num = nAll * tpSum - pe
    val den = nAll * nAll - pe
    val kappa = if (den == 0) 0L
      else if (num >= 0) 1000000L * num / den else -(1000000L * -num / den)
    assert(rows.forall(_.getLong(8) == kappa))
    // macro-F1 averages per-label F1 over supported labels
    val supported = rows.filter(_.getLong(1) > 0)
    val macroF1 = supported.map(_.getLong(6)).sum / supported.length
    assert(rows.forall(_.getLong(7) == macroF1))
  }

  test("q243: the identity temperature reproduces q237's ECE; best is the min") {
    val rows = EvalQueries.queries("q243_temperature_scaling")(spark, dir)
      .collect()
    assert(rows.length == 5)
    val ece237 = EvalQueries.queries("q237_reliability")(spark, dir)
      .collect()(0).getLong(5)
    val id = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 1L).get
    assert(id.getLong(3) == ece237,
      s"identity-scale ECE ${id.getLong(3)} vs q237 $ece237")
    val best = rows.map(_.getLong(3)).min
    rows.foreach { r =>
      assert(r.getLong(4) == best)
      assert(r.getBoolean(5) == (r.getLong(3) == best))
      // every grid point scores the full margin frame
      assert(r.getLong(2) == rows.head.getLong(2))
    }
  }

  test("q244: Brier/reliability/uncertainty match a BigInt brute recompute; identity slack bounded") {
    val row = EvalQueries.queries("q244_brier_decomposition")(spark, dir)
      .collect()(0)
    val m = EvalQueries.margins(spark, dir).collect()
      .map(r => (r.getLong(0) == r.getLong(1), r.getLong(2)))
    val n = m.length.toLong
    // brute, in BigInt so the spec can't share an overflow bug
    val brier = (m.map { case (ok, c) =>
      val d = BigInt(c) - (if (ok) 1000000 else 0)
      d * d
    }.sum / n).toLong
    val bins = m.groupBy { case (_, c) => math.min(c / 100000L, 9L) }
    val rel = (bins.values.map { xs =>
      val gap = (BigInt(1000000) * xs.count(_._1) -
        xs.map(x => BigInt(x._2)).sum).abs
      gap * gap / xs.length
    }.sum / n).toLong
    val aPpm = 1000000L * m.count(_._1) / n
    val unc = aPpm * (1000000L - aPpm)
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == brier, s"brier ${row.getLong(1)} vs $brier")
    assert(row.getLong(2) == rel, s"rel ${row.getLong(2)} vs $rel")
    assert(row.getLong(3) == unc)
    assert(row.getLong(4) == rel + unc - brier)
    // generalized-resolution identity (Stephenson et al. 2008):
    // gres = RES − WBV + 2·WBC when bins hold non-constant
    // confidences — direct double recompute, floor slack only
    val acc = m.count(_._1).toDouble / n
    val direct = bins.values.map { xs =>
      val nb = xs.length
      val cb = xs.map(_._2.toDouble / 1e6).sum / nb
      val ab = xs.count(_._1).toDouble / nb
      val res = nb * (ab - acc) * (ab - acc)
      val wbv = xs.map(x => math.pow(x._2 / 1e6 - cb, 2)).sum
      val wbc = xs.map(x =>
        (x._2 / 1e6 - cb) * ((if (x._1) 1.0 else 0.0) - ab)).sum
      res - wbv + 2 * wbc
    }.sum / n * 1e12
    assert(math.abs(row.getLong(4) - direct) < 1e7,
      s"gres ${row.getLong(4)} vs direct $direct")
  }

  test("q245: replicate membership reproduces an independent JVM md5; spread consistent") {
    val rows = EvalQueries.queries("q245_half_sample_stability")(spark, dir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 16)
    val m = EvalQueries.marginsById(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1) == r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      val kept = m.filter { case (id, _) => hex(id).charAt(i - 1) >= '8' }
      assert(r.getLong(1) == kept.length.toLong, s"replicate $i n")
      assert(r.getLong(2) == kept.count(_._2).toLong, s"replicate $i correct")
      assert(r.getLong(3) == 1000000L * kept.count(_._2) / kept.length)
    }
    val accs = rows.map(_.getLong(3))
    rows.foreach { r =>
      assert(r.getLong(4) == accs.min && r.getLong(5) == accs.max)
      assert(r.getLong(6) == accs.max - accs.min)
    }
    // half-samples: each replicate holds roughly half the corpus
    rows.foreach(r => assert(r.getLong(1) > m.length / 4 &&
      r.getLong(1) < 3L * m.length / 4))
  }

  test("q247: paired cells partition the corpus and marginal accuracies reconcile") {
    val r = EvalQueries.queries("q247_mcnemar")(spark, dir).collect()(0)
    val (n, n11, n10, n01, n00) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(n == nVecs && n11 + n10 + n01 + n00 == n)
    // classifier A's marginal accuracy is q194's diagonal mass
    val diag = EvalQueries.queries("q194_centroid_classifier")(spark, dir)
      .collect().filter(x => x.getLong(0) == x.getLong(1))
      .map(_.getLong(2)).sum
    assert(n11 + n10 == diag, s"acc_a mass ${n11 + n10} vs q194 $diag")
    assert(r.getLong(5) == 1000000L * (n11 + n10) / n)
    assert(r.getLong(6) == 1000000L * (n11 + n01) / n)
    val mc = if (n10 + n01 == 0) -1L
      else 1000000L * (n10 - n01) * (n10 - n01) / (n10 + n01)
    assert(r.getLong(7) == mc)
  }

  test("q248: nested splits double, the test half is fixed, accuracies bounded") {
    val rows = EvalQueries.queries("q248_learning_curve")(spark, dir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val ids = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0))
    rows.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == ids.count(_ % 16 < k).toLong, s"k=$k train")
      assert(r.getLong(2) == ids.count(_ % 16 >= 8).toLong, s"k=$k test")
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(4) == 1000000L * r.getLong(3) / r.getLong(2))
    }
    // nested: each fraction's training set contains the previous one
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) >= a.getLong(1))
    }
  }

  test("q220: ceil-k formula holds and coverage concentrates at 1 - alpha") {
    val rows = EvalQueries.queries("q220_conformal")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nCal, k) = (r.getLong(1), r.getLong(2))
      assert(k == math.min((9 * (nCal + 1) + 9) / 10, nCal), s"label ${r.getLong(0)}")
      assert(!r.getBoolean(3) || k == nCal)
      assert(r.getLong(6) <= r.getLong(5)) // covered <= tested
      assert(r.getLong(7) == 1000000L * r.getLong(6) / r.getLong(5))
    }
    // distribution-free coverage: the per-label mean sits near 0.9 on
    // the exchangeable three-way split (wide band — small per-label n)
    val mean = rows.map(r => r.getLong(7).toDouble).sum / rows.length / 1e6
    assert(mean > 0.75 && mean <= 1.0, s"mean coverage $mean")
  }
}
