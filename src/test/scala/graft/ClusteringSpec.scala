package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** Integer k-means invariants: exact quantization, true-argmin
  * assignment, partition invariance (the determinism contract that
  * makes the iterative DuckDB differential oracle possible), and the
  * empty-cluster keep-previous rule. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("q238 MMR rerank matches a driver-side exhaustive greedy recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q238_mmr_rerank")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent path: collect ALL quantized vectors (test-only; the
    // query itself only collects the 16-candidate pool), then run the
    // full pool build + greedy in plain Scala
    val all = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), KMeans.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val probe = all(0L)
    val pool = all.iterator.filter(_._1 != 0L)
      .map { case (id, qv) => (id, qv, sqd(qv, probe)) }.toSeq
      .sortBy { case (id, _, d) => (d, id) }.take(16)
    var picked = Vector.empty[(Long, Long)]
    for (_ <- 1 to 8) {
      val best = pool.filter(c => !picked.exists(_._1 == c._1)).map { c =>
        val div =
          if (picked.isEmpty) 0L
          else 3L * picked.map(p => sqd(c._2, all(p._1))).min
        (c._1, div - 7L * c._3)
      }.minBy { case (id, sc) => (-sc, id) }
      picked :+= best
    }
    val want = picked.zipWithIndex.map { case ((id, sc), i) =>
      ((i + 1).toLong, id, sqd(all(id), probe), sc)
    }
    assert(got.toSeq == want)
    // structural invariants: rank 1 is the plain nearest neighbor;
    // picks are distinct and never the probe itself
    assert(got.head._2 == pool.head._1)
    assert(got.map(_._2).distinct.length == 8 && !got.exists(_._2 == 0L))
  }

  test("q117 decontamination matches a driver-side exhaustive recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q117_embedding_decontamination")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    // reference: quantize and scan all (corpus, bench) pairs
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * (1L << 20)).toLong))
    val bench = all.filter(_._1 % 20 == 0).sortBy(_._1).take(100)
    val theta = 1450000000000L
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(got.keySet == all.filter(_._1 % 20 != 0).map(_._1).toSet)
    for ((id, v) <- all if id % 20 != 0) {
      val ds = bench.map { case (bid, bv) => (d2(v, bv), bid) }
      val hits = ds.count(_._1 <= theta).toLong
      val (nd, nb) = ds.min
      assert(got(id) == ((hits, nb, nd, hits > 0)),
        s"vec $id: got ${got(id)}, want ${(hits, nb, nd, hits > 0)}")
    }
  }

  test("graft_nearest matches the interpreted HOF argmin and breaks ties to the smaller index") {
    val rng = new scala.util.Random(3)
    val df = (0 until 50).map(i =>
        (i.toLong, Seq.fill(6)(rng.nextLong() % 1000)))
      .toDF("id", "qv")
    val cents = Array.fill(4)(Array.fill(6)(rng.nextLong() % 1000))
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val kernel = df.select($"id", call_function("graft_nearest", $"qv", centsLit).as("b"))
      .select($"id", $"b.d", $"b.c").orderBy("id").collect().toSeq
    val hof = df.select($"id", array_min(transform(
        array(cents.zipWithIndex.map { case (v, i) =>
          struct(typedLit(v.toSeq).as("cv"), lit(i).as("cid")) }: _*),
        ct => struct(
          aggregate(zip_with($"qv", ct("cv"), (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, x) => acc + x).as("d"),
          ct("cid").as("c")))).as("b"))
      .select($"id", $"b.d", $"b.c").orderBy("id").collect().toSeq
    assert(kernel == hof)
    // tie-break: equidistant centroids resolve to the smaller index
    val tie = Seq((0L, Seq(0L, 0L))).toDF("id", "qv")
      .select(call_function("graft_nearest", $"qv",
        typedLit(Seq(Seq(3L, 4L), Seq(4L, 3L), Seq(0L, 5L)))).as("b"))
      .select($"b.d", $"b.c").head
    assert(tie.getLong(0) == 25L && tie.getInt(1) == 0)
    // null vector → null; empty centroid table → null
    val nulls = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("qv")
      .select(call_function("graft_nearest", $"qv",
        typedLit(Seq(Seq(1L)))).as("b")).head
    assert(nulls.isNullAt(0))
  }

  test("graft_sqdist matches the interpreted HOF fold and its null contract") {
    val rng = new scala.util.Random(19)
    val df = (0 until 80).map(i => (i.toLong,
        Seq.fill(16)(rng.nextLong() % 4194304L),
        Seq.fill(16)(rng.nextLong() % 4194304L)))
      .toDF("id", "a", "b")
    val kernel = df.select($"id",
        call_function("graft_sqdist", $"a", $"b").as("d"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    val hof = df.select($"id",
        aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x).as("d"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(kernel == hof)
    // null contract: null array, null element, mismatched lengths → null
    val edge = Seq(
      (Option(Seq(1L, 2L)), Option.empty[Seq[Long]]),
      (Option(Seq(1L, 2L)), Option(Seq(1L))),
      (Option(Seq(1L, 2L)), Option(Seq(1L, 2L)))).toDF("a", "b")
      .select(call_function("graft_sqdist", $"a", $"b")).collect()
    assert(edge(0).isNullAt(0) && edge(1).isNullAt(0))
    assert(edge(2).getLong(0) == 0L)
  }

  test("quantize is floor(x * 2^20) exactly") {
    val df = vecs(0L -> Seq(0.5f, -0.5f, 0.0f, 1.0f / 3.0f))
    val q = df.select(KMeans.quantize($"embedding")).head.getSeq[Long](0)
    assert(q(0) == 524288L && q(1) == -524288L && q(2) == 0L)
    // 1/3f widens to double exactly; floor of the scaled value
    assert(q(3) == math.floor(1.0f / 3.0f.toDouble * 1048576L).toLong)
  }

  test("fit matches an independent driver-side Lloyd reimplementation exactly") {
    // third implementation (after Spark and the DuckDB oracle): plain
    // Scala k-means with the same quantization/seeding/floorDiv rules
    // must reproduce (cluster, dist) for every row bit-for-bit.
    val n = 40; val k = 3; val iters = 2
    val rng = new scala.util.Random(7)
    val data = (0 until n).map(i =>
      i.toLong -> Seq.fill(8)(rng.nextFloat() * 2 - 1))
    val fitted = KMeans.fit(vecs(data: _*), "vec_id", "embedding", k, iters)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap

    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val qv: Map[Long, Array[Long]] = data.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1048576L).toLong).toArray
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def argmin(v: Array[Long], cents: Array[Array[Long]]): (Int, Long) =
      cents.zipWithIndex.map { case (c, i) => (d2(v, c), i) }.min match {
        case (d, i) => (i, d)
      }
    var cents = data.map(_._1).sortBy(id => md5hex(s"km:$id")).take(k)
      .map(qv(_).clone()).toArray
    for (_ <- 1 to iters) {
      val asg = qv.view.mapValues(v => argmin(v, cents)._1).toMap
      val next = cents.map(_.clone())
      for (cid <- 0 until k) {
        val members = qv.keys.filter(asg(_) == cid).toSeq
        if (members.nonEmpty)
          next(cid) = (0 until 8).map(dd => Math.floorDiv(
            members.map(qv(_)(dd)).sum, members.size.toLong)).toArray
      }
      cents = next
    }
    val expected = qv.map { case (id, v) =>
      id -> { val (c, d) = argmin(v, cents); (c, d) } }
    assert(fitted == expected)
  }

  test("fit is invariant to input partitioning and repeated runs") {
    val rng = new scala.util.Random(11)
    val df = vecs((0 until 60).map(i =>
      i.toLong -> Seq.fill(8)(rng.nextFloat())): _*)
    val a = KMeans.fit(df, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val b = KMeans.fit(df.repartition(13), "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val c = KMeans.fit(df.repartition(1), "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("vec_id").collect().toSeq
    assert(a == b && a == c)
  }

  test("an emptied cluster keeps its previous centroid instead of dying") {
    // k = n with a duplicated vector: the duplicate's cluster drains to
    // the smaller cid at the first assignment and must survive as a
    // valid (previous) centroid — the run stays total and deterministic.
    val df = vecs(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(1.0f, 0.0f), // identical pair
      2L -> Seq(0.0f, 1.0f), 3L -> Seq(-1.0f, 0.0f))
    val fitted = KMeans.fit(df, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fitted.length == 4)
    // the identical pair lands together with dist 0 to their centroid
    val m = fitted.map(f => f._1 -> f).toMap
    assert(m(0L)._2 == m(1L)._2 && m(0L)._3 == m(1L)._3)
    // distinct vectors with their own surviving centroids: exact 0 dist
    assert(fitted.count(_._3 == 0L) == 4)
  }

  test("q100 respects per-cluster budgets that sum to at most the total") {
    val out = graft.queries.ClusteringQueries.queries("q100_cluster_sample")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // per cluster: exactly min(budget, n_members) rows, ranks 1..that
    rows.groupBy(_.getLong(0)).foreach { case (c, rs) =>
      val budget = rs.head.getLong(3)
      val n = rs.head.getLong(2)
      assert(rs.length == math.min(budget, n).toInt, s"cluster $c row count")
      assert(rs.map(_.getInt(4).toLong).sorted.toSeq == (1L to rs.length.toLong))
    }
    // floor allocation never overshoots the total
    val budgetSum = rows.groupBy(_.getLong(0)).values.map(_.head.getLong(3)).sum
    assert(budgetSum <= 60L)
  }

  test("nearDup finds planted duplicates and elects the minimal representative") {
    // two far-apart groups; ids 0/1/5 identical in group A, 2/3 identical
    // in group B, 4 near-but-outside-theta in B. theta = 0 keeps only
    // exact quantized duplicates.
    val a = Seq(1.0f, 0.0f, 0.0f); val b = Seq(0.0f, 1.0f, 0.0f)
    val df = vecs(
      0L -> a, 1L -> a, 5L -> a,
      2L -> b, 3L -> b, 4L -> Seq(0.0f, 1.0f, 0.1f))
    val out = KMeans.nearDup(df, "vec_id", "embedding",
        k = 2, iters = 2, theta = 0L)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((2L, 0L)) && out(1L) == ((2L, 0L)) && out(5L) == ((2L, 0L)))
    assert(out(2L) == ((1L, 2L)) && out(3L) == ((1L, 2L)))
    assert(out(4L) == ((0L, 4L))) // near B but outside theta: kept, no dups
    // the A and B triples landed in different clusters
    val cl = KMeans.nearDup(df, "vec_id", "embedding", 2, 2, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(0L) == cl(1L) && cl(1L) == cl(5L))
    assert(cl(2L) == cl(3L) && cl(0L) != cl(2L))
  }

  test("nearDup on the fixture: linear output, keep <= id, threshold bites") {
    val out = graft.queries.ClusteringQueries.queries(
      "q111_cluster_semantic_dedup")(spark, "/root/testdata/sf0.001").collect()
    val n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert(out.length.toLong == n) // one row per vector, always
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(0)) // keep = min(self, neighbors)
      assert(r.getLong(2) >= 0L)
    }
    // Theta is calibrated to make neighborhoods nontrivial at every SF
    assert(out.exists(_.getLong(2) > 0L), "threshold never bit — Theta miscalibrated")
    // representative symmetry: if v keeps w < v then w has a neighbor too
    val m = out.map(r => r.getLong(0) -> r).toMap
    out.filter(r => r.getLong(3) != r.getLong(0)).foreach { r =>
      assert(m(r.getLong(3)).getLong(2) > 0L)
    }
  }

  test("cluster sizes in q98 sum to the corpus and match the assignment") {
    val out = graft.queries.ClusteringQueries.queries("q98_kmeans")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    val n = rows.length
    assert(n > 0)
    val sizes = rows.groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.length }
    rows.foreach { r =>
      assert(r.getLong(3) == sizes(r.getLong(1)).toLong,
        s"n_members mismatch for cluster ${r.getLong(1)}")
    }
    assert(sizes.values.sum == n)
  }

  test("q143 PQ/ADC: codes in range, ranks dense, per-query distances monotone, runs deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.ClusteringQueries.queries("q143_pq_adc")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Seq(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)), r.getInt(7)))
    val rows = run()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, d, codes, _) =>
      assert(d >= 0)
      codes.foreach(c => assert(c >= 0 && c < 16, s"code $c out of [0,16)"))
    }
    // self-matches excluded; ranks dense from 1; adc monotone per query
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(!rs.exists(_._2 == q), s"query $q retrieved itself")
      val byRank = rs.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1 to rs.length),
        s"query $q ranks not dense")
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sorted.toSeq,
        s"query $q adc_dist not monotone in rank")
    }
    // end-to-end determinism (training seeds are content-addressed,
    // LUT arithmetic exact) — a full re-run is bit-identical
    assert(run().toSeq == rows.toSeq)
  }

  test("q147 IVF-PQ: candidates only from probed lists, ranks dense, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.ClusteringQueries.queries("q147_ivf_pq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    val rows = run()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      // the IVF contract: every retrieved vector came from one of the
      // query's <= NProbe probed coarse lists
      assert(rs.map(_._3).distinct.size <= 2,
        s"query $q drew candidates from more than NProbe lists")
      assert(!rs.exists(_._2 == q), s"query $q retrieved itself")
      val byRank = rs.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1 to rs.length))
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sorted.toSeq)
    }
    assert(run().toSeq == rows.toSeq)
  }

  test("q240 nprobe sweep: cost doubles down the curve, recall arithmetic exact") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.ClusteringQueries
      .queries("q240_ivf_nprobe_sweep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val rows = run()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L), "one row per sweep point")
    // cost axis: candidates strictly grow with nprobe (each point's
    // probed lists are a superset of the previous point's)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    assert(rows.sliding(2).forall { case Array(a, b) => b._2 > a._2 },
      "more probed lists must mean strictly more candidates")
    rows.foreach { case (np, _, nOver, ppm) =>
      assert(nOver >= 0 && nOver <= 80, s"nprobe=$np overlap out of range")
      assert(ppm == 1000000L * nOver / 80,
        s"nprobe=$np recall_ppm must be the exact integer ratio")
    }
    // the sweep exists to show recall is BUYABLE: the widest probe
    // must retrieve at least as much truth as the narrowest (ADC
    // reranking makes intermediate points non-monotone in theory, but
    // the endpoints ordering is the curve's reason to exist)
    assert(rows.last._3 >= rows.head._3)
    assert(run().toSeq == rows.toSeq) // deterministic end to end
  }

  test("graft_matvec matches the per-row interpreted HOF folds and its null contract") {
    val rng = new scala.util.Random(37)
    val mat: Seq[Seq[Long]] = Seq.fill(5)(Seq.fill(16)(rng.nextLong() % 1024L))
    val df = (0 until 60).map(i => (i.toLong,
        Seq.fill(16)(rng.nextLong() % 4194304L))).toDF("id", "v")
    val kernel = df.select($"id",
        call_function("graft_matvec", $"v", typedLit(mat)).as("p"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    val hof = df.select($"id",
        array((0 until 5).map(j =>
          aggregate(zip_with($"v", typedLit(mat(j)), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x)): _*).as("p"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(kernel == hof)
    val edge = Seq(
      (Option(Seq(1L, 2L)), Option.empty[Seq[Seq[Long]]]),
      (Option(Seq(1L, 2L)), Option(Seq(Seq(1L)))),
      (Option(Seq(1L, 2L)), Option(Seq(Seq(3L, 4L), Seq(5L, 6L)))))
      .toDF("v", "m")
      .select(call_function("graft_matvec", $"v", $"m")).collect()
    assert(edge(0).isNullAt(0) && edge(1).isNullAt(0))
    assert(edge(2).getSeq[Long](0).toSeq == Seq(11L, 17L))
  }

  test("q158 distortion: per-list accounting covers the corpus, mean ≤ max, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.ClusteringQueries
      .queries("q158_pq_distortion")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = run()
    assert(rows.nonEmpty && rows.length <= 8)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_._2).sum == n, "every vector must land in exactly one list")
    rows.foreach { case (c, nv, mean, mx) =>
      assert(nv >= 1 && mean >= 0 && mean <= mx,
        s"list $c: mean/max distortion inconsistent")
    }
    assert(run().toSeq == rows.toSeq)
  }

  test("q159 JL: kernel projection equals driver refold on the md5-parity matrix") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.SimilarityQueries
      .queries("q159_jl_projection")(spark, dir).collect()
    assert(out.nonEmpty && out.head.length == 17)
    def md5Hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sgn(i: Int, j: Int) =
      1L - 2L * (java.lang.Long.parseLong(md5Hex(s"jl:$i:$j").substring(0, 12), 16) % 2)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576L).toLong)).toMap
    out.take(20).foreach { r =>
      val id = r.getLong(0)
      val v = vecs(id)
      (0 until 16).foreach { j =>
        val want = v.indices.map(i0 => v(i0) * sgn(i0 + 1, j)).sum
        assert(r.getLong(1 + j) == want, s"vec $id dim $j: JL refold mismatch")
      }
    }
  }

  test("q160 hamming: distances in [0,64], ranks dense, monotone, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.SimilarityQueries
      .queries("q160_binary_hamming")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val rows = run()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(!rs.exists(_._2 == q), s"query $q retrieved itself")
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to rs.length), s"query $q ranks not dense")
      val hs = byRank.map(_._3)
      assert(hs.forall(h => h >= 0 && h <= 64), s"query $q: hamming out of range")
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b },
        s"query $q: hamming not monotone in rank")
    }
    assert(run().toSeq == rows.toSeq)
  }

  test("q161 recall: overlap bounded by k, ppm arithmetic exact, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.SimilarityQueries
      .queries("q161_ann_recall")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = run()
    assert(rows.length == 4, "one row per probe")
    rows.foreach { case (q, k, n, ppm) =>
      assert(k == 10 && n >= 0 && n <= k, s"probe $q: overlap $n out of [0,$k]")
      assert(ppm == (1000000L * n) / k, s"probe $q: ppm mismatch")
    }
    assert(run().toSeq == rows.toSeq)
  }

  test("q163 drift: populations conserve the corpus, shares floor-sum to ~1e6") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.ClusteringQueries
      .queries("q163_ivf_drift")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val rows = run()
    assert(rows.nonEmpty && rows.length <= 8)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nNew = emb.where(col("vec_id") % 5 === 0).count()
    val nHist = emb.count() - nNew
    assert(rows.map(_._2).sum == nHist && rows.map(_._3).sum == nNew,
      "per-list populations must conserve both slices")
    rows.foreach { case (c, nh, nn, hs, ns, d) =>
      assert(hs == 1000000L * nh / nHist && ns == 1000000L * nn / nNew,
        s"list $c: share arithmetic")
      assert(d == math.abs(hs - ns), s"list $c: drift arithmetic")
    }
    val hsSum = rows.map(_._4).sum
    assert(hsSum <= 1000000L && hsSum > 1000000L - rows.length,
      "floor shares must sum to 1e6 minus sub-ppm rounding")
    assert(run().toSeq == rows.toSeq)
  }

  test("q162 cascade: stage precedence honored against per-stage recomputation") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.ClusteringQueries
      .queries("q162_dedup_cascade")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    assert(rows.values.toSet.subsetOf(Set("exact", "span", "semantic", "unique")))
    // driver recomputation of the exact stage: full-text md5 groups
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byText = docs.groupBy(_._2).values.map(_.map(_._1).min).toSet
    docs.foreach { case (id, text) =>
      val isExactDup = !byText.contains(id) &&
        docs.exists { case (o, t) => t == text && o < id }
      if (isExactDup) assert(rows(id) == "exact", s"doc $id: exact dup mislabeled")
      else assert(rows(id) != "exact", s"doc $id: not an exact dup but labeled exact")
    }
    // every doc labeled
    assert(rows.size == docs.length)
  }

  test("q154 mean direction: |proj| non-increasing, exact vs driver refold, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.ClusteringQueries
      .queries("q154_mean_direction")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = run()
    assert(rows.length == 50)
    val absProjs = rows.map { case (_, p) => math.abs(p) }
    assert(absProjs.zip(absProjs.tail).forall { case (a, b) => a >= b },
      "|proj| must be non-increasing down the ranking")
    // driver refold: recompute mu and every returned proj from raw parquet
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576L).toLong).toArray).toMap
    val dim = vecs.values.head.length
    val mu = (0 until dim).map(i =>
      Math.floorDiv(vecs.values.map(_(i)).sum, vecs.size.toLong))
    for ((id, p) <- rows)
      assert(p == (0 until dim).map(i => vecs(id)(i) * mu(i)).sum,
        s"vec $id: proj mismatch vs driver refold")
    assert(run().toSeq == rows.toSeq)
  }

  test("q151 triplets: pos strictly nearer than neg, ids distinct, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.ClusteringQueries
      .queries("q151_contrastive_triplets")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val rows = run()
    assert(rows.nonEmpty)
    rows.foreach { case (a, pos, pd, neg, nd) =>
      assert(pos != a && neg != a, s"anchor $a retrieved itself")
      assert(pos != neg, s"anchor $a: pos == neg")
      // rank 1 vs rank NegRank under a total order ⇒ (pd, pos) < (nd, neg)
      assert(pd < nd || (pd == nd && pos < neg),
        s"anchor $a: pos (d=$pd) not nearer than neg (d=$nd)")
      assert(pd >= 0, s"anchor $a: negative distance")
    }
    assert(run().toSeq == rows.toSeq)
  }
  test("q207: separation stats are consistent with the shared fit") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q207_cluster_separation")(spark, dir)
      .collect()
    assert(rows.length == 8, "one row per coarse cluster")
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nVecs)
    rows.foreach { r =>
      assert(r.getLong(3) > 0, "distinct centroids have positive distance")
      assert(r.getLong(4) == 1000000L * r.getLong(2) / r.getLong(3))
    }
  }

}
