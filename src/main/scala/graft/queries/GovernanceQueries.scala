package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    "q181_distinct_n" -> ((s, dir) => {
      val g = docs(s, dir)
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
    }))

  val oracleSql: Map[String, String] = Map(

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
         |ORDER BY h2.source""".stripMargin)
}
