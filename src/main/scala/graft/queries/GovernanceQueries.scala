package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.sources.Tables

/** Dataset-governance and evaluation-hygiene queries (q179+): purged
  * walk-forward time splits (the leakage-safe cross-validation scheme
  * for temporally-ordered training data), a k-anonymity suppression
  * audit over quasi-identifier cells, distinct-n lexical-diversity
  * scoring per source, and a robust median/MAD outlier gate — the
  * split/privacy/diversity checks a training-data pipeline runs
  * before a corpus ships.
  *
  * House rules: every emitted number is an exact integer (ppm
  * fixed-point, epoch-millis arithmetic, integer division on
  * non-negative operands so `div` and DuckDB `//` agree); no rand();
  * every ORDER BY is a total order.
  */
object GovernanceQueries {

  private def docs(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  /** q179: fold count and the embargo half-width (milliseconds) purged
    * around each test fold's time range. */
  private val Folds = 5L
  private val EmbargoMs = 3600000L

  /** q180: minimum cell size for a quasi-identifier combination to
    * escape suppression. */
  private val KAnon = 4L

  /** q182: flag documents farther than MadC·MAD from their source's
    * median token count. */
  private val MadC = 3L

  /** q221: ECDF bin width in characters (the length domain bounds the
    * bin spine — ~28 bins over the fixture's ≤560-char docs). */
  private val KsBinChars = 20L

  /** q227: minimum distinct sensitive values per quasi-identifier
    * cell (the l-diversity bar). */
  private val LDiv = 3L

  /** q228: the t-closeness bar in ppm (t = 0.35). The ×1e6 rendering
    * of Σ|cᵥ·N − gᵥ·n| stays in int64 while n·N < 9·10¹² — at a
    * larger table drop the fixed point before the N² product. */
  private val TClosePpm = 350000L

  /** q203: the referential constraints audited — (name, child table,
    * child key, parent table, parent key). */
  private val FkConstraints: Seq[(String, String, String, String, String)] =
    Seq(
      ("events.user_id->customer", "events", "user_id",
        "customer", "c_custkey"),
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"))

  /** q204: the q63 sample discipline (md5 bucket < SampleBuckets of
    * 100). */
  private val SamplePct = 10L

  /** Lower-median of an integer-valued column via its value-space
    * histogram, APPENDED as a column (not reduced to a separate frame):
    * the first value whose running count reaches half the total (ties
    * to the smaller middle for even counts) — exact, never a global
    * sort (all three windows run per source over the |distinct
    * values|-sized rollup), and crucially join-free, so q182 stays ONE
    * linear lineage: a reduce-to-frame + join-back variant was tried
    * and REJECTED (each join re-instantiated the histogram subtree and
    * re-tokenized the corpus — 2.6 s vs 1.1 s at sf0.1; localCheckpoint
    * and lazy persist both measured worse still, 4.5 s and 13.6 s). */
  private def withHistMedian(hist: DataFrame, valueCol: String,
      outCol: String): DataFrame = {
    val bySrc = Window.partitionBy("source")
    val cum = Window.partitionBy("source").orderBy(valueCol)
    hist
      .withColumn("ntot", sum("c").over(bySrc))
      .withColumn("cc", sum("c").over(cum))
      .withColumn(outCol, min(when(
        col("cc") * 2 >= col("ntot") + col("ntot") % 2,
        col(valueCol))).over(bySrc))
      .drop("ntot", "cc")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KOLMOGOROV–SMIRNOV SOURCE-SHIFT AUDIT (q221): for every source,
    // the exact two-sample KS distance between ITS document-length
    // distribution and the rest of the corpus — the distribution-shift
    // gate that catches a feed whose content changed shape (truncated
    // docs, template floods) even when its volume looks normal. All
    // exact integers: lengths quantize to width-[[KsBinChars]] bins,
    // both ECDFs are evaluated on the shared bin spine, and the sup
    // statistic is the max over bins of |cum_s·n_other − cum_o·n_s|
    // (the cross-multiplied form of |F̂_s − F̂_o|, no division). Scale
    // shape: one map-combinable (source, bin) rollup; every window
    // runs over the LENGTH-DOMAIN-bounded bin spine (the q212
    // histogram discipline — the unpartitioned cum_all window sorts
    // |bins| rows, never the corpus); the per-source argmax streams
    // through a |sources|·|bins| frame. ks_scaled ≤ n_s·n_other, so
    // the ×1e6 ppm rendering stays in int64 below ~3e6 docs per side
    // — past that, drop the fixed-point scale (comment, not cliff).
    "q221_ks_distance" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(col("source"), expr(s"n_chars div $KsBinChars").as("bin"))
      val bySrc = d.groupBy("source", "bin").agg(count(lit(1)).as("c"))
      val srcs = d.groupBy("source").agg(count(lit(1)).as("n_s"))
      val tot = d.agg(count(lit(1)).as("n_tot"))
      val cAll = d.groupBy("bin").agg(count(lit(1)).as("ca"))
        .withColumn("cum_all", sum("ca").over(Window.orderBy("bin")))
        .select("bin", "cum_all")
      val cells = srcs.crossJoin(broadcast(cAll))
        .join(bySrc, Seq("source", "bin"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("cum_s",
          sum("c").over(Window.partitionBy("source").orderBy("bin")))
        .crossJoin(broadcast(tot))
        .withColumn("n_other", col("n_tot") - col("n_s"))
        .withColumn("diff", abs(col("cum_s") * col("n_other") -
          (col("cum_all") - col("cum_s")) * col("n_s")))
      cells
        .withColumn("rk", row_number().over(Window.partitionBy("source")
          .orderBy(col("diff").desc, col("bin").asc)))
        .where(col("rk") === 1)
        .select(col("source"), col("n_s"), col("n_other"),
          col("bin").as("ks_bin"), col("diff").as("ks_scaled"),
          expr("(CAST(1000000 AS BIGINT) * diff) div (n_s * n_other)")
            .as("ks_ppm"))
        .orderBy("source")
    }),

    // T-CLOSENESS AUDIT (q228): the third privacy bar (Li et al.
    // 2007) — a cell can be k-anonymous AND l-diverse yet still leak
    // when its sensitive DISTRIBUTION deviates from the table's (a
    // cell that is 90 % one segment against a 20 % base rate tells an
    // attacker plenty). Per QI cell, the variational distance between
    // the cell's segment distribution and the global one, in the
    // exact cross-multiplied form Σ|cᵥ·N − gᵥ·n| over the segment
    // spine (ordered-EMD reduces to this for categorical attributes;
    // ÷ 2·n·N gives the [0,1] statistic, rendered as exact ppm with
    // non-negative integer division). Scale shape: two map-combinable
    // rollups + one broadcast of the |segments|-row global
    // distribution against the cell×segment spine — no windows, no
    // corpus-sized frame.
    "q228_t_closeness" -> ((s, dir) => {
      val q = Tables.load(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nation"),
          expr("(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000)" +
            " div 100000").as("bal_band"),
          col("c_mktsegment").as("seg"))
      val global = q.groupBy("seg").agg(count(lit(1)).as("g"))
      val totals = q.agg(count(lit(1)).as("big_n"))
      val cells = q.groupBy("nation", "bal_band", "seg")
        .agg(count(lit(1)).as("c"))
      val cellN = q.groupBy("nation", "bal_band").agg(count(lit(1)).as("n"))
      cellN.crossJoin(broadcast(global))
        .join(cells, Seq("nation", "bal_band", "seg"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(totals))
        .groupBy("nation", "bal_band")
        .agg(max("n").as("n"),
          sum(abs(col("c") * col("big_n") - col("g") * col("n")))
            .as("dist_scaled"),
          max(col("big_n")).as("big_n"))
        .select(col("nation"), col("bal_band"), col("n"),
          col("dist_scaled"),
          expr("(CAST(1000000 AS BIGINT) * dist_scaled)" +
            " div (2 * n * big_n)").as("t_ppm"))
        .withColumn("t_close", col("t_ppm") <= lit(TClosePpm))
        .orderBy("nation", "bal_band")
    }),

    // L-DIVERSITY AUDIT (q227): q180's k-anonymity counts how many
    // rows share a quasi-identifier cell; this audits what an attacker
    // LEARNS inside the cell — a cell where every member shares one
    // sensitive value is fully disclosed no matter how k-anonymous
    // (the homogeneity attack; Machanavajjhala et al. 2007). QI =
    // (nation, balance band), sensitive = market segment; per cell the
    // distinct-sensitive count l, the k/l gates, and the strongest
    // inference confidence max_seg_ppm = the largest single-value
    // share (exact ppm — 1e6 means disclosed). Scale shape: two
    // map-combinable rollups on bounded-cardinality keys, zero
    // windows, zero joins.
    "q227_l_diversity" -> ((s, dir) => {
      val q = Tables.load(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nation"),
          expr("(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000)" +
            " div 100000").as("bal_band"),
          col("c_mktsegment").as("seg"))
      q.groupBy("nation", "bal_band", "seg").agg(count(lit(1)).as("c"))
        .groupBy("nation", "bal_band")
        .agg(sum("c").as("n"), count(lit(1)).as("l_distinct"),
          max("c").as("max_seg"))
        .select(col("nation"), col("bal_band"), col("n"),
          col("l_distinct"),
          (col("n") >= KAnon).as("k_anonymous"),
          (col("l_distinct") >= LDiv).as("l_diverse"),
          expr("(CAST(1000000 AS BIGINT) * max_seg) div n")
            .as("max_seg_ppm"))
        .orderBy("nation", "bal_band")
    }),

    // PURGED WALK-FORWARD SPLIT (q179): the leakage-safe K-fold scheme
    // for time-ordered data (the purged CV of the financial-ML
    // literature, applied to event-stream training data): the time
    // axis cuts into Folds equal ranges, each fold's test set is its
    // range, and its TRAIN set excludes an EmbargoMs band around the
    // range — events inside the band are PURGED (near-boundary rows
    // whose labels/windows straddle the cut would leak). Reported per
    // fold: test/train/purged counts, a 3·K-cell audit that catches
    // both clock skew (purged counts explode) and fold imbalance
    // before an expensive training run. Scale shape: one scalar
    // min/max broadcast fixes the boundaries, then a single linear
    // pass expands each event to its K fold verdicts (K is a literal)
    // into a map-combinable K-row count rollup — no sort, no
    // quantiles, nothing corpus-sized past the scan.
    "q179_purged_split" -> ((s, dir) => {
      val ev0 = Tables.load(s, dir, "events")
        .select(unix_millis(col("ts")).as("t"))
      val b = ev0.agg(min("t").as("t0"), max("t").as("t1"))
      ev0.crossJoin(broadcast(b))
        .withColumn("r", col("t1") - col("t0") + 1)
        .withColumn("evf", least(lit(Folds - 1),
          expr(s"($Folds * (t - t0)) div r")))
        .select(col("t"), col("t0"), col("r"), col("evf"),
          explode(sequence(lit(0L), lit(Folds - 1))).as("fold"))
        .withColumn("fs", col("t0") + expr(s"(fold * r) div $Folds"))
        .withColumn("fe", col("t0") + expr(s"((fold + 1) * r) div $Folds"))
        .groupBy("fold")
        .agg(
          sum(when(col("evf") === col("fold"), 1L).otherwise(0L))
            .as("n_test"),
          sum(when(col("evf") =!= col("fold") &&
            (col("t") < col("fs") - EmbargoMs ||
              col("t") >= col("fe") + EmbargoMs), 1L).otherwise(0L))
            .as("n_train"),
          sum(when(col("evf") =!= col("fold") &&
            col("t") >= col("fs") - EmbargoMs &&
            col("t") < col("fe") + EmbargoMs, 1L).otherwise(0L))
            .as("n_purged"))
        .orderBy("fold")
    }),

    // K-ANONYMITY AUDIT (q180): the privacy gate run before releasing
    // a training extract keyed on quasi-identifiers — every
    // (nation, segment, $1000-balance-band) cell is reported with its
    // population and a suppression verdict (n < KAnon ⇒ the cell
    // re-identifies), plus the one-level GENERALIZATION fallback (drop
    // the band) and ITS verdict, so the release policy can pick
    // suppress-vs-generalize per cell. Balances enter as exact cents
    // with a +$1000 offset so the banding division runs on
    // non-negative integers (`div` = DuckDB `//` only there). Scale
    // shape: two map-combinable rollups over the same projection and
    // a cell-table join — value-space-bounded everywhere.
    "q180_k_anonymity" -> ((s, dir) => {
      val q = Tables.load(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"),
          expr("(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000)" +
            " div 100000").as("bal_band"))
      val g = q.groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("n"))
      val gen = q.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n_gen"))
      g.join(gen, Seq("c_nationkey", "c_mktsegment"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
          col("n"),
          when(col("n") < KAnon, 1L).otherwise(0L).as("suppressed"),
          col("n_gen"),
          when(col("n_gen") < KAnon, 1L).otherwise(0L).as("suppressed_gen"))
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")
    }),

    // DISTINCT-N DIVERSITY (q181): the text-generation diversity
    // metric (unique n-grams / total n-grams, n = 1..3) computed per
    // source — the repetitiveness fingerprint that separates template
    // mills (distinct-2 collapses) from organic text, complementing
    // q86's within-document repetition with an ACROSS-document view.
    // Scale shape: one corpus scan expands each document to its grams
    // for the three literal n values; total counts are map-combinable
    // and the distinct count shuffles on (source, n, gram) — bounded
    // by the observed gram space, the same budget every n-gram query
    // in the engine already pays.
    // Fan-out (r14): the gram expansion is ~30× the scan bytes and ran
    // entirely inside the single-row-group scan task (1.44 s serial
    // stage of a 1.97 s query); one doc_id repartition after the read
    // parallelizes it (FanOut scaladoc; results placement-invariant —
    // exact counts/distincts over strings).
    "q181_distinct_n" -> ((s, dir) => {
      val g = graft.operators.FanOut.byKey(docs(s, dir), col("doc_id"))
        .select(col("source"), TextAnalysis.tokens(col("text")).as("toks"))
        .withColumn("nt", size(col("toks")).cast("long"))
        .select(col("source"), col("nt"), col("toks"),
          explode(typedLit(Seq(1L, 2L, 3L))).as("n"))
        .where(col("nt") >= col("n"))
        .select(col("source"), col("n"),
          explode(expr(
            """transform(sequence(CAST(1 AS BIGINT), nt - n + 1),
              |  p -> concat_ws(' ',
              |    slice(toks, CAST(p AS INT), CAST(n AS INT))))"""
              .stripMargin)).as("gram"))
      g.groupBy("source", "n")
        .agg(count(lit(1)).as("total_grams"),
          countDistinct("gram").as("distinct_grams"))
        .withColumn("distinct_ppm",
          expr("(CAST(1000000 AS BIGINT) * distinct_grams) div total_grams"))
        .orderBy("source", "n")
    }),

    // ROBUST OUTLIER GATE (q182): per-source median/MAD fence on
    // document token counts — the robust-statistics twin of a
    // z-score filter (median and MAD shrug off the very outliers a
    // mean/stddev fence lets distort it). Both statistics are EXACT
    // lower-medians extracted from value-space histograms (the q172
    // capped-bin discipline without the cap: token counts are
    // naturally bounded), and every later stage — the deviation
    // histogram, the fence count, the max deviation — derives from
    // the FIRST histogram, so the whole audit costs ONE corpus scan.
    // Emitted per source: population, median, MAD, how many documents
    // sit beyond MadC·MAD (the quarantine budget), and the worst
    // deviation — always |sources| rows, so the differential stays
    // informative even on a fixture with zero outliers (sf1 measures
    // max_dev ≈ 45–51 against a fence of 3·MAD ≈ 60–72). Scale
    // shape: one map-combinable value-bounded rollup + per-source
    // windows over tiny histograms; no global sort, nothing
    // corpus-sized after the scan.
    "q182_mad_outliers" -> ((s, dir) => {
      val m = docs(s, dir)
        .select(col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      val h = m.groupBy("source", "n_tokens").agg(count(lit(1)).as("c"))
      val h2 = withHistMedian(h, "n_tokens", "med")
        .groupBy(col("source"), col("med"),
          abs(col("n_tokens") - col("med")).as("dev"))
        .agg(sum("c").as("c"))
      withHistMedian(h2, "dev", "mad")
        .groupBy("source", "med", "mad")
        .agg(sum("c").as("n_docs"),
          sum(when(col("dev") > lit(MadC) * col("mad"), col("c"))
            .otherwise(0L)).as("n_outliers"),
          max("dev").as("max_dev"))
        .select(col("source"), col("n_docs"), col("med"), col("mad"),
          col("n_outliers"), col("max_dev"))
        .orderBy("source")
    }),

    // REFERENTIAL-INTEGRITY AUDIT (q203): for every foreign-key
    // relationship, the orphan mass (child rows whose key has no
    // parent) AND the reverse coverage (parent keys no child ever
    // references) — the constraint check a lakehouse runs on every
    // ingest batch, with the unreferenced-parent count doubling as a
    // liveness signal (on this fixture: 90 % of customers never emit
    // an event, 1.7 % of orders carry no line items — real numbers a
    // data catalog would surface). Scale shape: per constraint, two
    // distinct-key rollups and two anti-joins shuffled on the key —
    // the join shape that scales; counts fold to 1-row frames and
    // cross-join as broadcast scalars.
    "q203_fk_audit" -> ((s, dir) => {
      val parts = FkConstraints.map { case (name, ct, ck, pt, pk) =>
        val ckc = Tables.load(s, dir, ct)
          .groupBy(col(ck).as("k")).agg(count(lit(1)).as("cn"))
        val pkeys = Tables.load(s, dir, pt).select(col(pk).as("pk"))
          .distinct()
        // all four statistics from ONE full-outer join of the two
        // key rollups — each base table is scanned exactly once
        ckc.join(pkeys, col("k") === col("pk"), "full_outer")
          .agg(sum(coalesce(col("cn"), lit(0L))).as("n_child"),
            sum(when(col("pk").isNull, col("cn")).otherwise(0L))
              .as("n_orphan_rows"),
            sum(when(col("pk").isNotNull, 1L).otherwise(0L)).as("n_parent"),
            sum(when(col("pk").isNotNull && col("k").isNull, 1L)
              .otherwise(0L)).as("n_unreferenced_parents"))
          .select(lit(name).as("constraint_name"), col("n_child"),
            col("n_orphan_rows"), col("n_parent"),
            col("n_unreferenced_parents"))
      }
      parts.reduce(_ unionAll _).orderBy("constraint_name")
    }),

    // SAMPLE-BIAS AUDIT (q204): does the standard 10 % hash sample
    // (q63's md5-bucket discipline) preserve the lang and source
    // distributions? Per (dimension, value): full-corpus share vs
    // in-sample share and their absolute drift, all in ppm — the
    // representativeness check run before trusting sample-based
    // corpus statistics. Scale shape: one map-combinable rollup per
    // dimension with the sample membership folded in as a conditional
    // count (the sample is never materialized), scalar totals
    // broadcast.
    "q204_sample_bias" -> ((s, dir) => {
      val d = docs(s, dir).select(col("lang"), col("source"),
        pmod(conv(substring(md5(concat(lit("sample:"),
          col("doc_id").cast("string"))), 1, 6), 16, 10).cast("long"),
          lit(100L)).as("b"))
      def dim(name: String, c: Column): DataFrame = {
        val f = d.groupBy(lit(name).as("dim"), c.as("value"))
          .agg(count(lit(1)).as("n_full"),
            sum(when(col("b") < SamplePct, 1L).otherwise(0L))
              .as("n_sample"))
        val t = f.agg(sum("n_full").as("tf"), sum("n_sample").as("ts"))
        f.crossJoin(broadcast(t))
          .select(col("dim"), col("value"), col("n_full"), col("n_sample"),
            expr("(CAST(1000000 AS BIGINT) * n_full) div tf")
              .as("share_full_ppm"),
            when(col("ts") === 0, -1L)
              .otherwise(expr("(CAST(1000000 AS BIGINT) * n_sample) div ts"))
              .as("share_sample_ppm"),
            abs(when(col("ts") === 0, 0L)
              .otherwise(expr("(CAST(1000000 AS BIGINT) * n_sample) div ts"))
              - expr("(CAST(1000000 AS BIGINT) * n_full) div tf"))
              .as("drift_ppm"))
      }
      dim("lang", col("lang")).unionAll(dim("source", col("source")))
        .orderBy("dim", "value")
    }),

    // SOURCE SKEW AUDIT (q206): the Lorenz curve and exact Gini
    // coefficient of per-source token mass — "how unequal is my
    // corpus across sources", the one-number skew summary that drives
    // mixture reweighting (q97/q132) and shard planning. Gini stays
    // exact-integer via the rank-weighted closed form
    // G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over the ascending-sorted
    // sources. Scale shape: one map-combinable corpus rollup to
    // |sources| rows; the global rank window runs on that
    // dimension-sized aggregate (the q189 discipline); totals
    // broadcast.
    "q206_source_skew" -> ((s, dir) => {
      val sk = docs(s, dir)
        .select(col("source"), size(TextAnalysis.tokens(col("text")))
          .cast("long").as("nt"))
        .groupBy("source").agg(sum("nt").as("toks"))
      val byToks = Window.orderBy(col("toks"), col("source"))
      val r = sk.withColumn("rank", row_number().over(byToks).cast("long"))
        .withColumn("cum", sum("toks").over(byToks))
      val t = r.agg(count(lit(1)).as("n"), sum("toks").as("tot"),
        sum(col("rank") * col("toks")).as("iws"))
      r.crossJoin(broadcast(t))
        .select(col("rank"), col("source"), col("toks"),
          expr("(CAST(1000000 AS BIGINT) * cum) div tot").as("lorenz_ppm"),
          expr("""(CAST(1000000 AS BIGINT) * (2 * iws - (n + 1) * tot))
                 | div (n * tot)""".stripMargin).as("gini_ppm"))
        .orderBy("rank")
    }))

  val oracleSql: Map[String, String] = Map(

    // q221: the same shared-spine ECDF construction; every operand is
    // a non-negative integer count so // mirrors div exactly.
    "q221_ks_distance" ->
      s"""WITH d AS (SELECT source, n_chars // $KsBinChars AS bin
         |  FROM documents),
         |by_src AS (SELECT source, bin, count(*) AS c FROM d GROUP BY 1, 2),
         |srcs AS (SELECT source, count(*) AS n_s FROM d GROUP BY 1),
         |tot AS (SELECT count(*) AS n_tot FROM d),
         |c_all AS (SELECT bin, CAST(sum(count(*))
         |    OVER (ORDER BY bin) AS BIGINT) AS cum_all
         |  FROM d GROUP BY bin),
         |cells AS (SELECT s.source, s.n_s, a.bin, a.cum_all,
         |    CAST(sum(coalesce(b.c, 0)) OVER (PARTITION BY s.source
         |      ORDER BY a.bin) AS BIGINT) AS cum_s,
         |    t.n_tot - s.n_s AS n_other
         |  FROM srcs s CROSS JOIN c_all a CROSS JOIN tot t
         |  LEFT JOIN by_src b ON b.source = s.source AND b.bin = a.bin),
         |diffs AS (SELECT source, n_s, n_other, bin,
         |    abs(cum_s * n_other - (cum_all - cum_s) * n_s) AS diff,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY abs(cum_s * n_other - (cum_all - cum_s) * n_s) DESC,
         |        bin ASC) AS rk
         |  FROM cells)
         |SELECT source, n_s, n_other, bin AS ks_bin, diff AS ks_scaled,
         |  (CAST(1000000 AS BIGINT) * diff) // (n_s * n_other) AS ks_ppm
         |FROM diffs WHERE rk = 1 ORDER BY source""".stripMargin,

    // q179: identical integer boundary arithmetic (epoch_ms mirrors
    // unix_millis; all operands non-negative offsets so // = div).
    "q179_purged_split" ->
      s"""WITH b AS (SELECT min(epoch_ms(ts)) AS t0, max(epoch_ms(ts)) AS t1
         |  FROM events),
         |ev AS (SELECT epoch_ms(e.ts) AS t, b.t0, b.t1 - b.t0 + 1 AS r,
         |  least(CAST(${Folds - 1} AS BIGINT),
         |    (($Folds * (epoch_ms(e.ts) - b.t0)) // (b.t1 - b.t0 + 1))) AS evf
         |  FROM events e CROSS JOIN b),
         |x AS (SELECT ev.*, f.fold,
         |  ev.t0 + (f.fold * ev.r) // $Folds AS fs,
         |  ev.t0 + ((f.fold + 1) * ev.r) // $Folds AS fe
         |  FROM ev CROSS JOIN
         |    (SELECT unnest(range(0, $Folds)) AS fold) f)
         |SELECT CAST(fold AS BIGINT) AS fold,
         |  CAST(count(*) FILTER (evf = fold) AS BIGINT) AS n_test,
         |  CAST(count(*) FILTER (evf <> fold
         |    AND (t < fs - $EmbargoMs OR t >= fe + $EmbargoMs)) AS BIGINT)
         |    AS n_train,
         |  CAST(count(*) FILTER (evf <> fold
         |    AND t >= fs - $EmbargoMs AND t < fe + $EmbargoMs) AS BIGINT)
         |    AS n_purged
         |FROM x GROUP BY 1 ORDER BY fold""".stripMargin,

    // q180: same cents offset banding, same two rollups.
    // q228: identical spine join (every cell × every global segment,
    // absent cells as 0) and cross-multiplied distance.
    "q228_t_closeness" ->
      s"""WITH q AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
         |  (CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000) // 100000
         |    AS bal_band,
         |  c_mktsegment AS seg FROM customer),
         |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS g FROM q GROUP BY 1),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS big_n FROM q),
         |cells AS (SELECT nation, bal_band, seg,
         |  CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1, 2, 3),
         |cn AS (SELECT nation, bal_band, CAST(count(*) AS BIGINT) AS n
         |  FROM q GROUP BY 1, 2),
         |sp AS (SELECT cn.nation, cn.bal_band, cn.n, g.seg, g.g,
         |    coalesce(cells.c, 0) AS c, tt.big_n
         |  FROM cn CROSS JOIN g CROSS JOIN tt
         |  LEFT JOIN cells ON cells.nation = cn.nation
         |    AND cells.bal_band = cn.bal_band AND cells.seg = g.seg),
         |d AS (SELECT nation, bal_band, max(n) AS n,
         |    CAST(sum(abs(c * big_n - g * n)) AS BIGINT) AS dist_scaled,
         |    max(big_n) AS big_n
         |  FROM sp GROUP BY 1, 2)
         |SELECT nation, bal_band, n, dist_scaled,
         |  (CAST(1000000 AS BIGINT) * dist_scaled) // (2 * n * big_n)
         |    AS t_ppm,
         |  (CAST(1000000 AS BIGINT) * dist_scaled) // (2 * n * big_n)
         |    <= $TClosePpm AS t_close
         |FROM d ORDER BY nation, bal_band""".stripMargin,

    // q227: identical cell/band arithmetic (non-negative operands,
    // // = div); booleans compare identically.
    "q227_l_diversity" ->
      s"""WITH q AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
         |  (CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000) // 100000
         |    AS bal_band,
         |  c_mktsegment AS seg FROM customer),
         |cells AS (SELECT nation, bal_band, seg,
         |  CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1, 2, 3)
         |SELECT nation, bal_band, CAST(sum(c) AS BIGINT) AS n,
         |  CAST(count(*) AS BIGINT) AS l_distinct,
         |  sum(c) >= $KAnon AS k_anonymous,
         |  count(*) >= $LDiv AS l_diverse,
         |  (CAST(1000000 AS BIGINT) * max(c)) // CAST(sum(c) AS BIGINT)
         |    AS max_seg_ppm
         |FROM cells GROUP BY 1, 2 ORDER BY nation, bal_band""".stripMargin,

    "q180_k_anonymity" ->
      s"""WITH q AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
         |  c_mktsegment,
         |  (CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000) // 100000
         |    AS bal_band FROM customer),
         |g AS (SELECT c_nationkey, c_mktsegment, bal_band,
         |  CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1, 2, 3),
         |gen AS (SELECT c_nationkey, c_mktsegment,
         |  CAST(count(*) AS BIGINT) AS n_gen FROM q GROUP BY 1, 2)
         |SELECT g.c_nationkey, g.c_mktsegment, g.bal_band, g.n,
         |  CAST(g.n < $KAnon AS BIGINT) AS suppressed, gen.n_gen,
         |  CAST(gen.n_gen < $KAnon AS BIGINT) AS suppressed_gen
         |FROM g JOIN gen USING (c_nationkey, c_mktsegment)
         |ORDER BY g.c_nationkey, g.c_mktsegment, g.bal_band""".stripMargin,

    // q181: same tokenizer, same gram rendering (space join), n=1..3.
    "q181_distinct_n" ->
      s"""WITH t AS (SELECT source, ${TextAnalysis.tokensSql("text")} AS toks
         |  FROM documents),
         |g AS (SELECT source, n, array_to_string(list_slice(toks,
         |    CAST(p AS INT), CAST(p AS INT) + CAST(n AS INT) - 1), ' ')
         |    AS gram
         |  FROM (SELECT source, toks, CAST(len(toks) AS BIGINT) AS nt FROM t),
         |       (SELECT unnest(range(1, 4)) AS n),
         |       LATERAL (SELECT unnest(range(1, nt - n + 2)) AS p)
         |  WHERE nt >= n)
         |SELECT source, CAST(n AS BIGINT) AS n,
         |  CAST(count(*) AS BIGINT) AS total_grams,
         |  CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams,
         |  (CAST(1000000 AS BIGINT) * count(DISTINCT gram)) // count(*)
         |    AS distinct_ppm
         |FROM g GROUP BY 1, 2 ORDER BY source, n""".stripMargin,

    // q182: the same histogram lower-median on both statistics, the
    // same fence count and max deviation off the deviation histogram.
    "q182_mad_outliers" ->
      s"""WITH m AS (SELECT source,
         |  CAST(len(${TextAnalysis.tokensSql("text")}) AS BIGINT)
         |    AS n_tokens FROM documents),
         |h AS (SELECT source, n_tokens, CAST(count(*) AS BIGINT) AS c
         |  FROM m GROUP BY 1, 2),
         |tot AS (SELECT source, sum(c) AS ntot FROM h GROUP BY 1),
         |cum AS (SELECT h.source, h.n_tokens,
         |    sum(h.c) OVER (PARTITION BY h.source ORDER BY h.n_tokens) AS cc,
         |    tot.ntot
         |  FROM h JOIN tot USING (source)),
         |med AS (SELECT source, min(n_tokens) AS med FROM cum
         |  WHERE 2 * cc >= ntot + (ntot % 2) GROUP BY 1),
         |h2 AS (SELECT h.source, abs(h.n_tokens - med.med) AS dev,
         |    CAST(sum(h.c) AS BIGINT) AS c
         |  FROM h JOIN med USING (source) GROUP BY 1, 2),
         |cum2 AS (SELECT h2.source, h2.dev,
         |    sum(h2.c) OVER (PARTITION BY h2.source ORDER BY h2.dev) AS cc,
         |    tot.ntot
         |  FROM h2 JOIN tot USING (source)),
         |mad AS (SELECT source, min(dev) AS mad FROM cum2
         |  WHERE 2 * cc >= ntot + (ntot % 2) GROUP BY 1)
         |SELECT h2.source, CAST(sum(h2.c) AS BIGINT) AS n_docs,
         |  med.med, mad.mad,
         |  CAST(sum(CASE WHEN h2.dev > $MadC * mad.mad THEN h2.c
         |    ELSE 0 END) AS BIGINT) AS n_outliers,
         |  max(h2.dev) AS max_dev
         |FROM h2 JOIN med USING (source) JOIN mad USING (source)
         |GROUP BY h2.source, med.med, mad.mad
         |ORDER BY h2.source""".stripMargin,

    // q203: same four statistics per constraint, as scalar subqueries.
    "q203_fk_audit" -> (FkConstraints.map { case (name, ct, ck, pt, pk) =>
      s"""SELECT '$name' AS constraint_name,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $ct) AS n_child,
         |  (SELECT CAST(coalesce(sum(cn), 0) AS BIGINT) FROM
         |    (SELECT c.$ck AS k, count(*) AS cn FROM $ct c
         |     LEFT JOIN (SELECT DISTINCT $pk AS pk2 FROM $pt) p
         |       ON p.pk2 = c.$ck
         |     WHERE p.pk2 IS NULL GROUP BY 1)) AS n_orphan_rows,
         |  (SELECT CAST(count(DISTINCT $pk) AS BIGINT) FROM $pt)
         |    AS n_parent,
         |  (SELECT CAST(count(*) AS BIGINT) FROM
         |    (SELECT DISTINCT $pk AS pk2 FROM $pt) p
         |    LEFT JOIN (SELECT DISTINCT $ck AS k FROM $ct) c ON c.k = p.pk2
         |    WHERE c.k IS NULL) AS n_unreferenced_parents""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY constraint_name")),

    // q204: the q63 bucket hash, shares per dimension.
    "q204_sample_bias" -> {
      def dim(name: String, colE: String) =
        s"""SELECT '$name' AS dim, $colE AS value,
           |  CAST(count(*) AS BIGINT) AS n_full,
           |  CAST(count(*) FILTER (b < $SamplePct) AS BIGINT) AS n_sample
           |FROM (SELECT lang, source,
           |  CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)),
           |    1, 6) AS BIGINT) % 100 AS b FROM documents)
           |GROUP BY 2""".stripMargin
      s"""WITH f AS (${dim("lang", "lang")}
         |UNION ALL
         |${dim("source", "source")}),
         |t AS (SELECT dim, CAST(sum(n_full) AS BIGINT) AS tf,
         |  CAST(sum(n_sample) AS BIGINT) AS ts FROM f GROUP BY 1)
         |SELECT f.dim, f.value, f.n_full, f.n_sample,
         |  CAST((1000000 * f.n_full) // t.tf AS BIGINT) AS share_full_ppm,
         |  CAST(CASE WHEN t.ts = 0 THEN -1
         |    ELSE (1000000 * f.n_sample) // t.ts END AS BIGINT)
         |    AS share_sample_ppm,
         |  CAST(abs(CASE WHEN t.ts = 0 THEN 0
         |      ELSE (1000000 * f.n_sample) // t.ts END
         |    - (1000000 * f.n_full) // t.tf) AS BIGINT) AS drift_ppm
         |FROM f JOIN t USING (dim) ORDER BY f.dim, f.value""".stripMargin
    },

    // q206: same ascending rank, same closed-form Gini.
    "q206_source_skew" ->
      s"""WITH s AS (SELECT source,
         |  CAST(sum(len(${TextAnalysis.tokensSql("text")})) AS BIGINT)
         |    AS toks FROM documents GROUP BY 1),
         |r AS (SELECT *, CAST(row_number() OVER w AS BIGINT) AS rank,
         |  CAST(sum(toks) OVER w AS BIGINT) AS cum FROM s
         |  WINDOW w AS (ORDER BY toks, source)),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(toks) AS BIGINT) AS tot,
         |  CAST(sum(rank * toks) AS BIGINT) AS iws FROM r)
         |SELECT r.rank, r.source, r.toks,
         |  CAST((1000000 * r.cum) // t.tot AS BIGINT) AS lorenz_ppm,
         |  CAST((1000000 * (2 * t.iws - (t.n + 1) * t.tot)) // (t.n * t.tot)
         |    AS BIGINT) AS gini_ppm
         |FROM r CROSS JOIN t ORDER BY r.rank""".stripMargin)
}
