package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Distributed BPE merge training — the tokenizer-training loop a
  * large-scale curation stack runs over its corpus (the iterative
  * continuation of q99's single-step pair statistics; reference
  * behavior anchor: dags/dag.py's token-level text handling, extended
  * to the merge-learning loop).
  *
  * Each step is the textbook BPE iteration, made differentially
  * verifiable by being exact-integer/exact-string end to end:
  *   1. count adjacent token pairs over the CURRENT sequences — one
  *      map-side-combinable (l, r) aggregation (pairs come from two
  *      in-row slices, never a positional self-join);
  *   2. pick the most frequent pair, ties to the lexicographically
  *      smallest (cnt DESC, l ASC, r ASC) — a total order, so the
  *      winner is engine-independent;
  *   3. re-tokenize every document with the greedy left-to-right
  *      single-pair merge ([[graft.functions.BpeKernels.mergePair]],
  *      one JIT'd pass; the pair lands as string literals in the plan,
  *      so application is a stateless narrow map — no join, no
  *      shuffle).
  *
  * Scale shape: the tokenized corpus is persisted ONCE; step i scans
  * the cache and applies the i-1 learned merges as stacked codegen'd
  * kernels inside a single WholeStageCodegen span (at 4 merges that is
  * cheaper than re-caching a mutated corpus per step; a production run
  * learning thousands of merges would checkpoint the re-tokenized
  * corpus every ~50 merges to cap the stack — same loop, one knob).
  * Per step the only shuffle is the pair-count aggregation, whose
  * map-side partials are bounded by the distinct-pair vocabulary, not
  * the corpus.
  */
object Bpe {

  /** Fixture-sized merge budget (the oracle unrolls one CTE block per
    * step, q98-style, so the count is pinned at authoring time). */
  val Steps = 4

  final case class MergeStep(step: Int, tokLeft: String, tokRight: String, cnt: Long)

  /** Adjacent-pair counts (tok_left, tok_right, cnt) over `toks`
    * sequences — q99's slice/zip_with shape, corpus-global. */
  def pairCounts(seq: DataFrame): DataFrame = {
    val n = greatest(size(col("toks")) - 1, lit(0))
    seq.select(explode(zip_with(
        slice(col("toks"), lit(1), n), slice(col("toks"), lit(2), n),
        (a, b) => struct(a.as("l"), b.as("r")))).as("pr"))
      .groupBy(col("pr.l").as("tok_left"), col("pr.r").as("tok_right"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Learns `steps` merges from `docs(textCol)` under the shared
    * tokenizer. A step with no remaining pair (degenerate corpus) is
    * skipped — every later step then sees the same empty count, so the
    * result simply has fewer rows (the oracle's empty `LIMIT 1` CTE
    * mirrors this). */
  def learn(docs: DataFrame, textCol: String = "text",
            steps: Int = Steps): Seq[MergeStep] = {
    require(steps >= 1, "steps must be positive")
    val base = docs.select(TextAnalysis.tokens(col(textCol)).as("toks"))
    base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = Seq.newBuilder[MergeStep]
    try {
      var seq = base
      var step = 1
      while (step <= steps) {
        val top = pairCounts(seq)
          .orderBy(col("cnt").desc, col("tok_left").asc, col("tok_right").asc)
          .limit(1).collect()
        if (top.nonEmpty) {
          val (l, r, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          out += MergeStep(step, l, r, c)
          seq = seq.withColumn("toks",
            call_function("graft_merge_pair", col("toks"), lit(l), lit(r)))
        }
        step += 1
      }
    } finally base.unpersist(blocking = false)
    out.result()
  }

  /** Encode — the inference side of [[learn]]: tokenize every
    * document and apply the learned merges in training order as
    * stacked [[graft.functions.BpeKernels]] kernels (one
    * WholeStageCodegen span, stateless narrow maps — no join, no
    * shuffle, no state; the merge table rides in the plan as string
    * literals exactly as a broadcast tokenizer model would at 1000
    * executors). Emits the EXACT encoded sequence (`'|'`-joined), not
    * just counts, so the differential oracle certifies every token of
    * every document. Merges preserve character content — the encoded
    * tokens concatenate back to the raw token stream (spec-pinned),
    * which is the invariant that makes BPE lossless. */
  def encode(docs: DataFrame, textCol: String = "text",
             steps: Int = Steps): DataFrame = {
    val merges = learn(docs, textCol, steps)
    val raw = docs.select(col("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("n_raw", size(col("toks")).cast("long"))
    val enc = merges.foldLeft(raw) { (df, m) =>
      df.withColumn("toks",
        call_function("graft_merge_pair", col("toks"), lit(m.tokLeft), lit(m.tokRight)))
    }
    enc.select(col("doc_id"), col("n_raw"),
        size(col("toks")).cast("long").as("n_bpe"),
        concat_ws("|", col("toks")).as("encoded"))
      .orderBy("doc_id")
  }
}
