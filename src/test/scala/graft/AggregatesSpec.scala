package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Error bounds for the sketch-based aggregates: q46's oracle hash-checks
  * the exact companions + within-bound booleans; this spec additionally
  * bounds the RAW sketch values against the exact answers. */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("graft_approx_distinct (q46's sketch) within 5% of exact on every group") {
    // bounds the EXACT aggregate q46 ships — the custom HLL
    // TypedImperativeAggregate, not the built-in approx_count_distinct
    val rows = Tables.load(spark, dir, "events").groupBy("event_type").agg(
        call_function("graft_approx_distinct", col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05, s"$tpe: approx=$approx exact=$exact err=$err")
    }
  }

  test("percentile_approx(0.5) lands between the 40th and 60th exact percentiles") {
    val e = Tables.load(spark, dir, "events")
    val approx = e.agg(percentile_approx(col("value"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    val Array(p40, p60) = e.stat.approxQuantile("value", Array(0.4, 0.6), 0.0)
    assert(approx >= p40 && approx <= p60, s"median=$approx not in [$p40,$p60]")
  }

  test("graft_bloom: no false negatives, partition-invariant bytes, bounded FPR") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.Bloom
    val keys = (0 until 500).map(i => s"key-$i")
    val df = keys.toDF("h")
    def bloomOf(parts: Int): Array[Byte] =
      df.repartition(parts).agg(call_function("graft_bloom", col("h")))
        .head.getAs[Array[Byte]](0)
    val b1 = bloomOf(1)
    val b7 = bloomOf(7)
    // merge is bytewise OR — associative/commutative/idempotent, so the
    // filter is bit-stable under any partitioning (the broadcast-index
    // contract: every executor computes the same bits)
    assert(java.util.Arrays.equals(b1, b7))
    val (m, k) = (Bloom.DefaultBits, Bloom.DefaultHashes)
    // no false negatives — the property q91's admit-without-verifying
    // path rests on
    keys.foreach(s => assert(
      Bloom.contains(b1, UTF8String.fromString(s), m, k), s"false negative: $s"))
    // false-positive rate on 2000 never-inserted keys stays well under
    // 1% (expected ≈ 2·10⁻⁴ for 500 keys in 8192 bits / 4 hashes)
    val fp = (0 until 2000).count(i =>
      Bloom.contains(b1, UTF8String.fromString(s"probe-$i"), m, k))
    assert(fp <= 20, s"implausible FPR: $fp/2000")
  }

  test("graft_bloom positions match the SQL md5 rendering (oracle parity)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.Bloom
    // the kernel's digest-byte arithmetic vs the conv(substr(md5)) form
    // the DuckDB oracle renders — one divergent bit and q91's
    // bloom_positive column hash-mismatches
    val m = Bloom.DefaultBits
    val keys = Seq("", "a", "key-42", "héllo wörld", "0123456789abcdef")
    val viaSql = keys.toDF("s").select(
      (0 until Bloom.DefaultHashes).map(j =>
        (conv(substring(md5(concat(lit(s"$j:"), col("s"))), 1, 12), 16, 10)
          .cast("long") % m).as(s"p$j")): _*).collect()
    keys.zip(viaSql).foreach { case (s, row) =>
      (0 until Bloom.DefaultHashes).foreach { j =>
        assert(Bloom.position(j, UTF8String.fromString(s), m) == row.getLong(j),
          s"position $j of '$s' diverges from the SQL rendering")
      }
    }
  }

  test("graft_cms: estimate >= exact always, partition-invariant, tight at fixture load") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.Cms
    val data = (0 until 300).flatMap(i => Seq.fill(i % 7 + 1)(s"tok-$i"))
    val df = data.toDF("t")
    def sk(parts: Int): Array[Byte] =
      df.repartition(parts).agg(call_function("graft_cms", col("t")))
        .head.getAs[Array[Byte]](0)
    val s1 = sk(1)
    // merge is element-wise sum — partial order never changes the grid
    assert(java.util.Arrays.equals(s1, sk(5)))
    val (d, w) = (Cms.DefaultDepth, Cms.DefaultWidth)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (t, n) =>
      val est = Cms.estimate(s1, UTF8String.fromString(t), d, w)
      // the one-sided guarantee is deterministic (counters only over-count)
      assert(est >= n, s"$t: est $est < exact $n")
      // at this load (~1200 increments over 2048 counters) collisions
      // add at most a few counts per cell
      assert(est <= n + 50, s"$t: est $est implausibly far above $n")
    }
    // serialization round-trips the grid exactly
    assert(java.util.Arrays.equals(Cms.serialize(Cms.deserialize(s1)), s1))
  }

  test("Bloom sizing: bitsFor/hashesFor reproduce the standard formulas") {
    import graft.functions.Bloom
    // 10⁹ keys at 1% FPR ≈ 9.59 Gbit ≈ 1.2 GB — one broadcast instead
    // of re-shuffling 10⁹ history hashes every batch
    val m = Bloom.bitsFor(1000000000L, 0.01)
    assert(m > 9500000000L && m < 9700000000L, s"m=$m")
    assert(Bloom.hashesFor(m, 1000000000L) == 7)
    // the fixture default holds ~250 keys at k=4 comfortably
    assert(Bloom.bitsFor(250, 1e-4) < Bloom.DefaultBits * 2)
  }

  test("observe() exposes pipeline metrics without a second pass (A2)") {
    val filtered = Tables.load(spark, dir, "events")
      .observe("stats", count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,4)")).as("total_value"))
      .where(col("event_type") === "click")
    filtered.collect() // metrics attach to the execution that ran
    val m = filtered.queryExecution.observedMetrics("stats")
    assert(m.getAs[Long]("n_rows") == 1000L) // metric sees ALL scanned rows
    assert(m.getAs[java.math.BigDecimal]("total_value") != null)
  }
}
