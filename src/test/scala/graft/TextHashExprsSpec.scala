package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Differential spec for the native text-hash kernels
  * (graft.functions.TextHashExprs): each codegen'd expression must be
  * BIT-IDENTICAL to the interpreted higher-order-function form it
  * replaced — the HOF forms are re-stated here verbatim (as they stood
  * before the kernel swap) and compared row-by-row over the fixture
  * corpus plus adversarial edge rows.
  */
class TextHashExprsSpec extends SparkSpec {

  import spark.implicits._

  // ---- the pre-kernel HOF renderings, kept as the spec's oracle ----

  private def minhashHof(sh: Column): Column =
    array((0 until Dedup.NumHashes).map(i =>
      array_min(transform(sh, x => md5(concat(lit(s"$i:"), x))))): _*)

  private def simhashHof(toks: Column): Column = {
    val hs = transform(toks, t => TextAnalysis.tokenHash(t))
    (0 until Dedup.SimHashBits).map { i =>
      val bal = aggregate(hs, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1).otherwise(-1))
      when(bal > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  private def fingerprintHof(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => (acc * 31L + TextAnalysis.tokenHash(t)) % TextAnalysis.fpMod)

  private def shinglesHof(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  // corpus rows + edge rows: empty text, single token, repeated tokens,
  // unicode, whitespace-only (tokens() yields an empty array for it)
  private def corpus = {
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
    val edges = Seq("", "one", "a a a a", "späck überfall 日本語 テスト", "   ",
      "x y z w v u t s r q p o n m").toDF("text")
    docs.unionByName(edges).withColumn("toks", TextAnalysis.tokens(col("text")))
  }

  test("graft_minhash ≡ interpreted HOF signature over corpus + edges") {
    val df = corpus.withColumn("sh", Dedup.shingles(col("toks")))
      .select(
        Dedup.minhashSignature(col("sh")).as("fast"),
        minhashHof(col("sh")).as("slow"))
    assert(df.where(not(col("fast") <=> col("slow"))).count() == 0)
  }

  test("graft_simhash ≡ interpreted HOF simhash over corpus + edges") {
    val df = corpus.select(
      Dedup.simhash(col("toks")).as("fast"),
      simhashHof(col("toks")).as("slow"))
    assert(df.where(not(col("fast") <=> col("slow"))).count() == 0)
  }

  test("graft_fingerprint ≡ interpreted HOF fingerprint over corpus + edges") {
    val df = corpus.select(
      TextAnalysis.fingerprint(col("toks")).as("fast"),
      fingerprintHof(col("toks")).as("slow"))
    assert(df.where(not(col("fast") <=> col("slow"))).count() == 0)
  }

  test("graft_shingles ≡ interpreted HOF shingles for n in 2..6") {
    (2 to 6).foreach { n =>
      val df = corpus.select(
        Dedup.shingles(col("toks"), n).as("fast"),
        shinglesHof(col("toks"), n).as("slow"))
      assert(df.where(not(col("fast") <=> col("slow"))).count() == 0, s"n=$n")
    }
  }

  test("graft_chargrams ≡ interpreted HOF char grams over corpus + edges") {
    def charGramsHof(text: Column): Column =
      array_distinct(transform(
        sequence(lit(1), greatest(length(text) - 2, lit(1))),
        i => text.substr(i, lit(3))))
    val df = corpus.select(
      Dedup.charGrams(lower(trim(col("text")))).as("fast"),
      charGramsHof(lower(trim(col("text")))).as("slow"))
    assert(df.where(not(col("fast") <=> col("slow"))).count() == 0)
    // edge rows incl. multi-byte text and length < 3
    val e = Seq("日本語テスト", "ab", "", "ééé").toDF("t").select(
      Dedup.charGrams(col("t")).as("fast"), charGramsHof(col("t")).as("slow"))
    assert(e.where(not(col("fast") <=> col("slow"))).count() == 0)
  }

  test("graft_shingles null-element and empty semantics match concat_ws") {
    val df = Seq(1).toDF("i").select(
      Dedup.shingles(array(lit("a"), lit(null), lit("b")), 5).as("short_mixed"),
      Dedup.shingles(array().cast("array<string>"), 3).as("empty"),
      Dedup.shingles(lit(null).cast("array<string>"), 3).as("null_arr"),
      Dedup.shingles(array(lit("a"), lit(null), lit("b"), lit("c")), 3).as("win_mixed"),
      shinglesHof(array(lit("a"), lit(null), lit("b"), lit("c")), 3).as("win_hof"))
    val r = df.head()
    assert(r.getAs[collection.Seq[String]]("short_mixed") == Seq("a b"))
    assert(r.getAs[collection.Seq[String]]("empty") == Seq(""))
    assert(r.isNullAt(r.fieldIndex("null_arr")))
    assert(r.getAs[collection.Seq[String]]("win_mixed") ==
      r.getAs[collection.Seq[String]]("win_hof"))
  }

  test("kernels ≡ HOF forms on generated random token arrays (seeded)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf(
      Gen.alphaLowerStr.map(s => if (s.isEmpty) "x" else s.take(6)),
      Gen.oneOf("the", "a", "x", "längé", "0", "!!"))
    val arr = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))
    val rows = (0 until 40).map(i =>
      Tuple1(arr.pureApply(Gen.Parameters.default, Seed(1000L + i))))
    val df = rows.toDF("toks")
      .withColumn("sh", Dedup.shingles(col("toks"), 3))
      .select(
        Dedup.minhashSignature(col("sh")).as("mh_f"),
        minhashHof(col("sh")).as("mh_s"),
        Dedup.simhash(col("toks")).as("sim_f"),
        simhashHof(col("toks")).as("sim_s"),
        TextAnalysis.fingerprint(col("toks")).as("fp_f"),
        fingerprintHof(col("toks")).as("fp_s"),
        Dedup.shingles(col("toks"), 4).as("sg_f"),
        shinglesHof(col("toks"), 4).as("sg_s"))
    assert(df.where(
      not(col("mh_f") <=> col("mh_s")) || not(col("sim_f") <=> col("sim_s")) ||
      not(col("fp_f") <=> col("fp_s")) || not(col("sg_f") <=> col("sg_s"))
    ).count() == 0)
  }

  test("mistyped input fails analysis with a clear type-mismatch message") {
    // checkInputDataTypes (not a resolved override): the error must name
    // the expected type, not surface as an opaque unresolved expression
    val bad = Seq(Tuple1(Array(1, 2, 3))).toDF("xs")
    bad.createOrReplaceTempView("th_bad")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_simhash(xs) FROM th_bad").collect()
    }
    assert(e.getMessage.contains("graft_simhash") &&
      e.getMessage.toLowerCase.contains("array<string>"), e.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_chargrams(xs, 3) FROM th_bad").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("string"), e2.getMessage)
    // graft_matvec (round-8 advisor): array<int> misuse must name the
    // expected signature, not fail as an unresolved expression
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_matvec(xs, array(xs)) FROM th_bad").collect()
    }
    assert(e3.getMessage.contains("graft_matvec") &&
      e3.getMessage.contains("array<bigint>"), e3.getMessage)
  }

  test("kernel null semantics: null array → null/skip; null element rules") {
    val df = Seq(1).toDF("i").select(
      Dedup.minhashSignature(lit(null).cast("array<string>")).as("mh_null"),
      Dedup.simhash(lit(null).cast("array<string>")).as("sh_null"),
      TextAnalysis.fingerprint(lit(null).cast("array<string>")).as("fp_null"),
      // null ELEMENT: minhash skips it (array_min semantics),
      // fingerprint nulls out (fold propagation), simhash votes -1
      Dedup.minhashSignature(array(lit("a"), lit(null))).as("mh_mixed"),
      Dedup.minhashSignature(array(lit("a"))).as("mh_plain"),
      TextAnalysis.fingerprint(array(lit("a"), lit(null))).as("fp_mixed"),
      Dedup.simhash(array(lit(null).cast("string"))).as("sh_onenull"),
      // empty arrays: minhash → all-null slots, simhash → 0, fp → 0
      Dedup.minhashSignature(array().cast("array<string>")).as("mh_empty"),
      Dedup.simhash(array().cast("array<string>")).as("sh_empty"),
      TextAnalysis.fingerprint(array().cast("array<string>")).as("fp_empty"))
    val r = df.head()
    assert(r.isNullAt(r.fieldIndex("mh_null")))
    assert(r.isNullAt(r.fieldIndex("sh_null")))
    assert(r.isNullAt(r.fieldIndex("fp_null")))
    assert(r.getAs[collection.Seq[String]]("mh_mixed") ==
      r.getAs[collection.Seq[String]]("mh_plain"))
    assert(r.isNullAt(r.fieldIndex("fp_mixed")))
    assert(r.getAs[Long]("sh_onenull") == 0L) // all votes -1 → all bits 0
    assert(r.getAs[collection.Seq[String]]("mh_empty").forall(_ == null))
    assert(r.getAs[Long]("sh_empty") == 0L)
    assert(r.getAs[Long]("fp_empty") == 0L)
  }
}
