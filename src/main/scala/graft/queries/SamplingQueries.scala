package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dataset-assembly extension queries (q63–q65, q85): reproducible
  * sampling and splitting — the operations that decide what 100 TB of
  * candidate text actually enters a training run. All hash-based
  * (content-addressed md5 buckets), never rand(): the assignment of a
  * document to train/val/test must survive re-runs, retries, and
  * engine swaps, which a seeded RNG over a shuffled partitioning does
  * not.
  */
object SamplingQueries {

  /** q232 shared body — `idiv` is the engine's integer-division token
    * (`div` in Spark SQL, `//` in DuckDB); every division operand is
    * non-negative so the two agree exactly; the signed shift is pure
    * subtraction of the two floor-ppm shares. `table` must expose
    * (doc_id, source, fp, ntok). */
  private def mixtureShiftSql(table: String, idiv: String): String =
    s"""WITH b AS (SELECT doc_id, source, fp, ntok FROM $table),
       |keep AS (SELECT fp, min(doc_id) AS doc_id FROM b GROUP BY fp),
       |kept AS (SELECT b.source, b.ntok FROM b
       |  JOIN keep ON keep.doc_id = b.doc_id AND keep.fp = b.fp),
       |pre AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS toks_before
       |  FROM b GROUP BY 1),
       |post AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS toks_after
       |  FROM kept GROUP BY 1),
       |tp AS (SELECT CAST(sum(toks_before) AS BIGINT) AS tot_before
       |  FROM pre),
       |ta AS (SELECT CAST(sum(toks_after) AS BIGINT) AS tot_after
       |  FROM post)
       |SELECT pre.source, pre.toks_before,
       |  coalesce(post.toks_after, 0) AS toks_after,
       |  (CAST(1000000 AS BIGINT) * pre.toks_before) $idiv tp.tot_before
       |    AS share_before_ppm,
       |  (CAST(1000000 AS BIGINT) * coalesce(post.toks_after, 0))
       |    $idiv ta.tot_after AS share_after_ppm,
       |  (CAST(1000000 AS BIGINT) * coalesce(post.toks_after, 0))
       |      $idiv ta.tot_after -
       |    (CAST(1000000 AS BIGINT) * pre.toks_before) $idiv tp.tot_before
       |    AS shift_ppm
       |FROM pre LEFT JOIN post ON post.source = pre.source
       |CROSS JOIN tp CROSS JOIN ta
       |ORDER BY pre.source""".stripMargin

  /** Portable md5 bucket in [0, buckets): same value in Spark and DuckDB. */
  private def hashBucket(c: Column, salt: String, buckets: Int): Column =
    pmod(conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 6), 16, 10)
      .cast("long"), lit(buckets))

  private def hashBucketSql(e: String, salt: String, buckets: Int): String =
    s"CAST('0x' || substr(md5('$salt' || CAST($e AS VARCHAR)), 1, 6) AS BIGINT) % $buckets"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Source-mixing weights with temperature α = 0.5 — the corpus
    // rebalancing step of multi-source training-set assembly
    // (published recipe: sampling probability ∝ size^α with α < 1 to
    // up-weight small high-quality sources; α = 0.5 keeps the
    // per-source weight an IEEE sqrt, which is CORRECTLY ROUNDED by
    // spec and therefore bit-identical across engines, where a pow()
    // would drift in the last ulp between libm and the JVM). The
    // normalizing sum is the other float hazard: a plain SUM() folds
    // in partition order, so both engines instead fold the per-source
    // weights in EXPLICIT source order (collect → sort → left fold,
    // the fingerprint-fold pattern) — bit-stable under any
    // parallelism. Scale: |sources| rows after one exact count/sum
    // aggregation; the fold is O(|sources|) on a broadcast scalar.
    "q97_source_mixing" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .withColumn("weight", sqrt(col("total_chars").cast("double")))
        .createOrReplaceTempView("mix_src")
      s.sql("""
        |WITH z AS (
        |  SELECT aggregate(array_sort(collect_list(struct(source, weight))),
        |    CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.weight) AS z
        |  FROM mix_src)
        |SELECT /*+ BROADCAST(z) */ source, n_docs, total_chars, weight,
        |  weight / z AS share
        |FROM mix_src CROSS JOIN z ORDER BY source""".stripMargin)
    }),

    // Mixture-budget epoch manifest (q132): the other half of source
    // mixing — q97 computes the WEIGHTS, this materializes the epoch:
    // a global token budget (half the corpus) is allocated per source
    // ∝ its temperature weight (α = 0.5 as floor(sqrt(src_tokens)) —
    // correctly-rounded IEEE sqrt + floor, identical in both engines),
    // then each source admits documents greedily in content-addressed
    // order until its budget is crossed — the deterministic "sample
    // this epoch's data ∝ size^α" recipe of multi-source training
    // assembly. Exact-integer throughout: the per-source allocation
    // uses the overflow-safe decomposition B·w div W =
    // (B div W)·w + ((B mod W)·w) div W: the naive product B·w wraps
    // int64 at a 100 TB corpus (B ≈ 10^13 tokens, w_max ≈ √10^13 ≈
    // 3.2·10^6 → 3.2·10^19 > 2^63), while the decomposition's largest
    // intermediate is (B mod W)·w < W·w_max ≤ √(|S|·T)·√T = T·√|S|
    // (Cauchy–Schwarz on W = Σ√tₛ) ≈ 10^17 for T = 10^13, |S| = 10^8
    // hosts — ~90× inside int64, and exact (no double rounding).
    // The per-source admission order is a TWO-LEVEL prefix sum (local
    // cumsums inside (source, leading-hex) ranges, 16 bounded offsets
    // per source broadcast back) — the q116 pattern, so no reducer
    // ever holds a whole source even when one source dominates the
    // corpus. Output is the admitted manifest; the crossing doc is
    // admitted (cum_before < budget), matching the shard-packing
    // convention.
    "q132_mixture_manifest" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(graft.functions.TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("h", md5(concat(lit("mix:"), col("doc_id").cast("string"))))
        .withColumn("r", substring(col("h"), 1, 1))
      val per = d.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
        .withColumn("w", floor(sqrt(col("src_tokens").cast("double"))).cast("long"))
      val tot = per.agg(sum("src_tokens").as("all_tokens"), sum("w").as("wsum"))
      val alloc = per.crossJoin(broadcast(tot))
        .select(col("source"),
          expr("""(all_tokens div 2) div wsum * w +
                 |((all_tokens div 2) % wsum * w) div wsum""".stripMargin).as("budget"))
      val win = Window.partitionBy("source", "r").orderBy("h", "doc_id")
      val local = d.withColumn("cum_in", sum("n_tokens").over(win))
      val offW = Window.partitionBy("source").orderBy("r")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = d.groupBy("source", "r").agg(sum("n_tokens").as("rtot"))
        .withColumn("off", coalesce(sum("rtot").over(offW), lit(0L)))
        .select("source", "r", "off")
      local.join(broadcast(offsets), Seq("source", "r"))
        .withColumn("cum_before", col("off") + col("cum_in") - col("n_tokens"))
        .join(broadcast(alloc), Seq("source"))
        .where(col("cum_before") < col("budget"))
        .select("source", "doc_id", "n_tokens", "cum_before", "budget")
        .orderBy("source", "cum_before", "doc_id")
    }),

    // DEDUP MIXTURE SHIFT (q232): exact dedup does not remove tokens
    // uniformly — a source full of syndicated copies shrinks more than
    // a source of originals, so the post-dedup mixture is NOT the one
    // the weights were tuned on. Per source: token mass before and
    // after global exact dedup (keeper = min doc_id per text hash —
    // cross-source duplicates credit the keeper's source, exactly how
    // a real dedup pass reassigns mass), both shares in exact ppm, and
    // the signed shift. Scale shape: one md5 hash-groupBy (the q50
    // shuffle), one keeper semi-join, two map-combinable rollups, two
    // broadcast scalars; |sources| output rows. See [[mixtureShiftSql]]
    // — the engine evaluates the same body over a temp view.
    "q232_dedup_mixture_shift" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), md5(col("text")).as("fp"),
          size(graft.functions.TextAnalysis.tokens(col("text")))
            .cast("long").as("ntok"))
        .createOrReplaceTempView("q232_docs")
      s.sql(mixtureShiftSql("q232_docs", "div"))
    }),

    // MIXTURE FEASIBILITY (q224): the converse of q132 — q132 spends
    // a GIVEN budget ∝ temperature weight; this computes the LARGEST
    // total budget the corpus can serve before some source exhausts
    // (B·wₛ/W ≤ tokensₛ for all s ⇒ B_max = min_s tokensₛ·W/wₛ), the
    // binding source, and each source's headroom — the "can we train
    // for another epoch at this mixture" check run before a data buy.
    // Exact integers via the q132 overflow-safe decomposition in
    // reverse: tokensₛ·W div wₛ = (tokensₛ div wₛ)·W +
    // ((tokensₛ mod wₛ)·W) div wₛ — the naive product wraps int64 at
    // 100 TB (T·W ≈ 10¹³ · 3·10¹⁰), the decomposition's largest
    // intermediate is wₛ·W ≈ 10¹⁷. Scale shape: one map-combinable
    // per-source rollup, two broadcast scalars, |sources| output rows,
    // no windows. (The per-source bound is a floor of the true
    // rational, so min-of-floors can undershoot the exact B_max by at
    // most 1 token — the conservative side.)
    "q224_mixture_feasibility" -> ((s, dir) => {
      val per = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(graft.functions.TextAnalysis.tokens(col("text")))
            .cast("long").as("n_tokens"))
        .groupBy("source").agg(sum("n_tokens").as("src_tokens"))
        .where(col("src_tokens") > 0)
        .withColumn("w",
          floor(sqrt(col("src_tokens").cast("double"))).cast("long"))
      val tot = per.agg(sum("w").as("wsum"))
      val j = per.crossJoin(broadcast(tot))
        .withColumn("max_budget", expr(
          "(src_tokens div w) * wsum + ((src_tokens % w) * wsum) div w"))
      val mn = j.agg(min("max_budget").as("feasible_budget"))
      j.crossJoin(broadcast(mn))
        .select(col("source"), col("src_tokens"), col("w"), col("wsum"),
          expr("(CAST(1000000 AS BIGINT) * w) div wsum").as("share_ppm"),
          col("max_budget"),
          (col("max_budget") === col("feasible_budget")).as("is_binding"),
          col("feasible_budget"))
        .orderBy("source")
    }),

    // 10% reproducible sample of documents.
    "q63_hash_sample" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("bucket", hashBucket(col("doc_id"), "sample:", 100))
        .where(col("bucket") < 10)
        .select("doc_id", "bucket", "lang")
        .orderBy("doc_id")),

    // Weighted stratified sample — sequential Poisson sampling (the
    // published order-sampling scheme: Ohlsson 1998): priority
    // ξ = u / w with u a content-addressed uniform and w = n_chars;
    // the k SMALLEST ξ per language are the sample, giving inclusion
    // probability ∝ weight with zero RNG state. u is the exact 48-bit
    // md5 integer (portable recipe, exact in a double) and w an exact
    // int, so ξ is ONE IEEE division — engine-identical and
    // re-run-stable — and the per-stratum selection streams through
    // the custom TopKPerKey operator instead of a full sort.
    "q85_weighted_sample" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .where(col("n_chars") > 0) // zero-weight rows are unsampleable
        .withColumn("u", conv(substring(
            md5(concat(lit("ws:"), col("doc_id").cast("string"))), 1, 12), 16, 10)
          .cast("double"))
        .withColumn("priority", col("u") / col("n_chars"))
        .select("doc_id", "lang", "n_chars", "priority")
      graft.operators.TopK.perKey(d, Seq("lang"),
          Seq("priority" -> true, "doc_id" -> true), k = 10)
        .select("lang", "doc_id", "n_chars", "priority", "rank")
        .orderBy("lang", "rank")
    }),

    // Split-leakage audit (q134): q64's 80/10/10 hash split is only
    // sound if near-copies don't straddle the boundary — a test doc
    // sharing verbatim passages with a train doc inflates eval. This
    // is the cross-split twin of q78's benchmark decontamination: an
    // EVAL (val/test) document is contaminated iff it shares ≥ 1
    // verbatim 8-token segment with ANY train document. Output is
    // LINEAR (one row per eval doc with its shared-segment count, the
    // actionable evict list) — never a pair list, so no quadratic blow
    // -up on heavy duplication. Scale shape: the train segment set is
    // distinct-hashed (map-side combinable), the eval side joins on
    // the segment hash (corpus-sized build side → shuffle equi-join,
    // AQE broadcasts if a small train slice), one groupBy per eval
    // doc. The split assignment is the SAME content-addressed bucket
    // as q64, so the audit composes with the declared split exactly.
    "q134_split_leakage" -> ((s, dir) => {
      val b = hashBucket(col("doc_id"), "split:", 100)
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"),
          graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
        .where(size(col("toks")) > 0)
      val segs = d.select(col("doc_id"), col("split"), expr(
        """explode(transform(sequence(0, (size(toks)-1) div 8),
          |  k -> md5(concat_ws(' ', slice(toks, k*8+1, 8)))))""".stripMargin).as("h"))
      val trainH = segs.where(col("split") === "train")
        .select(col("h")).distinct().withColumn("hit", lit(1))
      segs.where(col("split") =!= "train")
        .join(trainH, Seq("h"), "left")
        .groupBy("doc_id", "split")
        .agg(count(lit(1)).as("n_segs"), count(col("hit")).as("n_shared"))
        .withColumn("contaminated", col("n_shared") > 0)
        .orderBy("doc_id")
    }),

    // 80/10/10 train/val/test split + per-split counts as a sanity row.
    "q64_dataset_split" -> ((s, dir) => {
      val b = hashBucket(col("doc_id"), "split:", 100)
      Tables.load(s, dir, "documents")
        .withColumn("split",
          when(b < 80, "train").when(b < 90, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          // BIGINT on both sides: DuckDB's sum(int) is HUGEINT, whose
          // canonical string the driver hashes differently from int64.
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("split")
    }),

    // Inverse-frequency class weights over the embeddings labels.
    // Single pass: one groupBy scan, then total/n_labels via a global
    // window over the |labels|-row aggregate (tiny by construction, so
    // the unpartitioned window never sees more than a handful of rows).
    "q65_label_weights" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy()
      Tables.load(s, dir, "embeddings")
        .groupBy("label").agg(count(lit(1)).as("n"))
        .withColumn("weight",
          sum(col("n")).over(w).cast("double") /
            // count only non-null label groups: the oracle's
            // COUNT(DISTINCT label) excludes NULLs, and a bare count of
            // grouped rows would include a NULL-label group
            (count(when(col("label").isNotNull, lit(1))).over(w) * col("n")))
        .select("label", "n", "weight")
        .orderBy("label")
    }))

  val oracleSql: Map[String, String] = Map(
    // q232: the shared body over the raw table with DuckDB's
    // integer-division token and list-based token count.
    "q232_dedup_mixture_shift" -> {
      val body = mixtureShiftSql("q232_base", "//")
      s"""WITH q232_base AS (SELECT doc_id, source, md5(text) AS fp,
         |  CAST(len(${graft.functions.TextAnalysis.tokensSql("text")})
         |    AS BIGINT) AS ntok FROM documents),
         |${body.stripPrefix("WITH ")}""".stripMargin
    },

    // q224: identical rollup, identical IEEE sqrt+floor weight, the
    // same overflow-safe decomposition (non-negative operands).
    "q224_mixture_feasibility" ->
      s"""WITH per AS (SELECT source,
         |    CAST(sum(len(${graft.functions.TextAnalysis.tokensSql("text")}))
         |      AS BIGINT) AS src_tokens
         |  FROM documents GROUP BY 1),
         |pw AS (SELECT source, src_tokens,
         |    CAST(floor(sqrt(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS w
         |  FROM per WHERE src_tokens > 0),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM pw),
         |j AS (SELECT pw.source, pw.src_tokens, pw.w, tot.wsum,
         |    (pw.src_tokens // pw.w) * tot.wsum +
         |      ((pw.src_tokens % pw.w) * tot.wsum) // pw.w AS max_budget
         |  FROM pw CROSS JOIN tot),
         |mn AS (SELECT min(max_budget) AS feasible_budget FROM j)
         |SELECT j.source, j.src_tokens, j.w, j.wsum,
         |  (CAST(1000000 AS BIGINT) * j.w) // j.wsum AS share_ppm,
         |  j.max_budget,
         |  j.max_budget = mn.feasible_budget AS is_binding,
         |  mn.feasible_budget
         |FROM j CROSS JOIN mn ORDER BY j.source""".stripMargin,

    "q63_hash_sample" ->
      s"""SELECT doc_id, ${hashBucketSql("doc_id", "sample:", 100)} AS bucket, lang
         |FROM documents WHERE ${hashBucketSql("doc_id", "sample:", 100)} < 10
         |ORDER BY doc_id""".stripMargin,

    "q85_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS DOUBLE)
        |      / n_chars AS priority
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rank FROM w)
        |SELECT lang, doc_id, n_chars, priority, rank FROM r WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,

    "q64_dataset_split" -> {
      val b = hashBucketSql("doc_id", "split:", 100)
      s"""SELECT CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin
    },

    "q65_label_weights" ->
      """SELECT label, count(*) AS n,
        |  CAST((SELECT count(*) FROM embeddings) AS DOUBLE) /
        |    ((SELECT count(DISTINCT label) FROM embeddings) * count(*)) AS weight
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    // q97: sqrt is correctly rounded (bit-identical across engines);
    // the normalizer folds the weights in explicit source order on
    // both sides, never a partition-order SUM of doubles.
    "q97_source_mixing" ->
      """WITH a AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY source),
        |w AS (SELECT *, sqrt(CAST(total_chars AS DOUBLE)) AS weight FROM a),
        |z AS (SELECT list_reduce(
        |    list_concat([CAST(0 AS DOUBLE)], list(weight ORDER BY source)),
        |    (acc, x) -> acc + x) AS z FROM w)
        |SELECT source, n_docs, total_chars, weight, weight / z.z AS share
        |FROM w CROSS JOIN z ORDER BY source""".stripMargin,

    // q134: the same split bucket as q64's oracle; eval-side counts
    // from one left semi-shaped join against the distinct train set.
    "q134_split_leakage" ->
      s"""WITH d AS (SELECT doc_id,
         |    CASE WHEN ${hashBucketSql("doc_id", "split:", 100)} < 80 THEN 'train'
         |         WHEN ${hashBucketSql("doc_id", "split:", 100)} < 90 THEN 'val'
         |         ELSE 'test' END AS split,
         |    ${graft.functions.TextAnalysis.tokensSql("text")} AS toks
         |  FROM documents),
         |dd AS (SELECT doc_id, split, toks FROM d WHERE len(toks) > 0),
         |segs AS (SELECT doc_id, split,
         |    unnest(list_transform(range(0, (len(toks)-1)//8 + 1),
         |      k -> md5(array_to_string(list_slice(toks, k*8+1, k*8+8), ' ')))) AS h
         |  FROM dd),
         |th AS (SELECT DISTINCT h FROM segs WHERE split = 'train'),
         |ev AS (SELECT segs.doc_id, segs.split,
         |    CASE WHEN th.h IS NOT NULL THEN 1 END AS hit
         |  FROM segs LEFT JOIN th ON th.h = segs.h
         |  WHERE segs.split <> 'train')
         |SELECT doc_id, split, count(*) AS n_segs, count(hit) AS n_shared,
         |  count(hit) > 0 AS contaminated
         |FROM ev GROUP BY doc_id, split
         |ORDER BY doc_id""".stripMargin,

    // q132: identical CTE chain — the only float op (sqrt) is floored
    // into an exact integer weight immediately, so the admission set
    // is bit-determined in both engines.
    "q132_mixture_manifest" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len(${graft.functions.TextAnalysis.tokensSql("text")}) AS BIGINT) AS n_tokens,
         |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS h,
         |    substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 1) AS r
         |  FROM documents),
         |per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
         |  FROM d GROUP BY source),
         |pw AS (SELECT source, src_tokens,
         |    CAST(floor(sqrt(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS w FROM per),
         |tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS all_tokens,
         |    CAST(sum(w) AS BIGINT) AS wsum FROM pw),
         |alloc AS (SELECT source,
         |    (all_tokens // 2) // wsum * w + ((all_tokens // 2) % wsum * w) // wsum
         |      AS budget
         |  FROM pw CROSS JOIN tot),
         |l AS (SELECT source, doc_id, n_tokens, h, r,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source, r ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_in
         |  FROM d),
         |o AS (SELECT source, r, coalesce(CAST(sum(rtot) OVER (PARTITION BY source
         |      ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS off
         |  FROM (SELECT source, r, sum(n_tokens) AS rtot FROM d GROUP BY source, r)),
         |j AS (SELECT l.source, l.doc_id, l.n_tokens,
         |    o.off + l.cum_in - l.n_tokens AS cum_before
         |  FROM l JOIN o ON o.source = l.source AND o.r = l.r)
         |SELECT j.source, j.doc_id, j.n_tokens, j.cum_before, a.budget
         |FROM j JOIN alloc a ON a.source = j.source
         |WHERE j.cum_before < a.budget
         |ORDER BY j.source, j.cum_before, j.doc_id""".stripMargin)
}
