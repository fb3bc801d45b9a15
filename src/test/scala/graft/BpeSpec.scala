package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE merge training (q101): the greedy single-pair merge kernel and
  * the full learner against an independent plain-Scala
  * reimplementation. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merged(toks: Seq[String], l: String, r: String): Seq[String] =
    Seq(Tuple1(toks)).toDF("toks")
      .select(call_function("graft_merge_pair", col("toks"), lit(l), lit(r)))
      .as[Seq[String]].head()

  test("graft_merge_pair is the greedy left-to-right scan") {
    assert(merged(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(merged(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(merged(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(merged(Seq("b", "a", "b"), "a", "b") == Seq("b", "ab"))
    assert(merged(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(merged(Seq.empty, "a", "b") == Seq.empty)
    // a null element never matches and passes through
    val withNull = Seq(Tuple1(Seq("a", null, "b", "a", "b")))
      .toDF("toks")
      .select(call_function("graft_merge_pair", col("toks"), lit("a"), lit("b")))
      .as[Seq[String]].head()
    assert(withNull == Seq("a", null, "b", "ab"))
  }

  // --- plain-Scala reference implementation (independent of Spark) ---
  private def refTokens(text: String): Vector[String] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toVector

  private def refMerge(toks: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(texts: Seq[String], steps: Int): Seq[(Int, String, String, Long)] = {
    var seqs = texts.map(refTokens)
    (1 to steps).flatMap { step =>
      val counts = seqs.flatMap(t => t.zip(t.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      if (counts.isEmpty) None else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        seqs = seqs.map(refMerge(_, l, r))
        Some((step, l, r, c))
      }
    }
  }

  test("learn matches an independent driver-side reimplementation exactly") {
    val rng = new scala.util.Random(101)
    val alphabet = Vector("a", "b", "c", "d", "e")
    val texts = (0 until 60).map(_ =>
      Seq.fill(3 + rng.nextInt(25))(alphabet(rng.nextInt(alphabet.size)))
        .mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.learn(df, "text", steps = 5)
      .map(m => (m.step, m.tokLeft, m.tokRight, m.cnt))
    assert(got == refLearn(texts, 5))
    assert(got.size == 5) // the fixture corpus never runs dry
  }

  test("encode matches the driver-side fold and is lossless on content") {
    val rng = new scala.util.Random(110)
    val alphabet = Vector("a", "b", "c", "d")
    val texts = (0 until 50).map(_ =>
      Seq.fill(2 + rng.nextInt(20))(alphabet(rng.nextInt(alphabet.size)))
        .mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = refLearn(texts, Bpe.Steps)
    val expect = texts.map(refTokens).map(raw =>
      merges.foldLeft(raw) { case (t, (_, l, r, _)) => refMerge(t, l, r) })
    val got = Bpe.encode(df).collect()
    got.zipWithIndex.foreach { case (row, i) =>
      assert(row.getLong(1) == texts(i).split("\\s+").count(_.nonEmpty).toLong)
      assert(row.getLong(2) == expect(i).size.toLong)
      assert(row.getString(3) == expect(i).mkString("|"))
      // lossless: merges only concatenate — character content survives
      assert(row.getString(3).replace("|", "") == refTokens(texts(i)).mkString(""))
    }
  }

  test("applyMerges caps the kernel stack and a 64-merge encode stays codegen'd") {
    val rng = new scala.util.Random(64)
    val alphabet = (0 until 8).map(i => s"t$i")
    val texts = (0 until 40).map(_ =>
      Seq.fill(6 + rng.nextInt(20))(alphabet(rng.nextInt(alphabet.size)))
        .mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // 64 merge pairs (the full 8×8 alphabet product) — the round-9
    // sf1 sweep showed a stack this size blows janino's 64 KB method
    // ceiling when unrolled into one span
    val merges = for (l <- alphabet; r <- alphabet) yield (l, r)
    assert(merges.size == 64)
    val raw = df.select(col("doc_id"),
      graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
    val out = Bpe.applyMerges(raw, merges)
    // structural cap: everything before the last checkpoint is
    // materialized away, so the live plan carries at most
    // CheckpointEvery stacked kernels
    val plan = out.queryExecution.executedPlan.toString
    val kernels = "graft_merge_pair".r.findAllIn(plan).size
    assert(kernels <= Bpe.CheckpointEvery,
      s"$kernels stacked kernels in one span (cap ${Bpe.CheckpointEvery})")
    // compile proof: with codegen fallback disabled, a span that
    // janino rejects would THROW instead of silently interpreting
    val fallbackKey = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(fallbackKey)
    try {
      spark.conf.set(fallbackKey, "false")
      val got = out.select(col("doc_id"), col("toks")).orderBy("doc_id")
        .as[(Long, Seq[String])].collect()
      // value check against the independent driver-side fold
      val expect = texts.map(refTokens).map(t =>
        merges.foldLeft(t) { case (acc, (l, r)) => refMerge(acc, l, r) })
      got.foreach { case (id, toks) => assert(toks == expect(id.toInt)) }
    } finally spark.conf.set(fallbackKey, prev)
  }

  test("learnMemoized returns the identical table without retraining") {
    val texts = Seq("a a b a b", "b a b b a", "a b a b a b")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fresh = Bpe.learn(df, "text", steps = 3)
    val m1 = Bpe.learnMemoized("bpespec-memo", df, steps = 3)
    // second call must hit the memo — hand it a frame that would
    // train to a DIFFERENT table if the loop actually ran
    val decoy = Seq((0L, "z z z z")).toDF("doc_id", "text")
    val m2 = Bpe.learnMemoized("bpespec-memo", decoy, steps = 3)
    assert(m1 == fresh && m2 == m1)
  }

  test("learn is invariant to input partitioning") {
    val rng = new scala.util.Random(7)
    val alphabet = Vector("x", "y", "z")
    val texts = (0 until 40).map(_ =>
      Seq.fill(2 + rng.nextInt(12))(alphabet(rng.nextInt(alphabet.size)))
        .mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = Bpe.learn(df, "text", steps = 3)
    val b = Bpe.learn(df.repartition(7), "text", steps = 3)
    val c = Bpe.learn(df.repartition(1), "text", steps = 3)
    assert(a == b && b == c)
  }
}
