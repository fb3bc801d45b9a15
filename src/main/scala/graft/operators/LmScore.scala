package graft.operators

import org.apache.spark.sql.DataFrame

/** Bigram language-model quality scoring — the CCNet-style perplexity
  * filter (Wenzek et al. 2020: score target docs under an LM trained
  * on a trusted reference corpus), made differentially verifiable by
  * being exact-integer end to end (reference behavior anchor: the
  * text-quality gating of dags/dag.py:55-70's keyword validity check,
  * generalized to a statistical model).
  *
  * The model is trained on the REFERENCE SLICE (doc_id % refMod = 0),
  * not the whole corpus: a self-trained MLE scores every singleton
  * bigram at probability 1 (its only context occurrence IS the
  * occurrence being scored), which would rank unique gibberish
  * highest. Holding the model corpus out restores the signal —
  * reference-like text hits trained bigrams, gibberish hits nothing
  * and scores 0. Exactly CCNet's reason for training on Wikipedia.
  *
  * Per-bigram score s(l,r) = floor(1e6 · cb(l,r) / cu(l)) where cb is
  * the model's bigram count and cu(l) = Σ_r cb(l,r) (so s ≤ 1e6
  * always, cb ≤ cu by construction); unseen bigram or context → 0.
  * Doc score = floor(Σ c·s / Σ c) over the doc's bigram multiset —
  * an integer in [0, 1e6], the fixed-point analog of exp(−perplexity)
  * under floor rounding, identical in any engine.
  *
  * Scale shape: bigrams come from two in-row slices (never a
  * positional self-join); doc-bigram and model aggregations are
  * map-side combinable and vocabulary-bounded; the scoring join is
  * hash-equi on (l, r) against the model (vocab-sized — broadcastable
  * at any corpus scale since the model is bounded by the reference
  * slice's bigram vocabulary, not the corpus); the final attach is a
  * linear doc_id-equi left join. One row per document.
  */
object LmScore {

  val Scale = 1000000L

  /** doc_id, n_bigrams, lm_score for every row of `docs(textCol)`;
    * docs with < 2 tokens score (0, 0). */
  def bigramLmScore(docs: DataFrame, textCol: String = "text",
                    refMod: Int = 10): DataFrame = {
    val s = docs.sparkSession
    docs.select(docs("doc_id"),
        graft.functions.TextAnalysis.tokens(docs(textCol)).as("toks"))
      .createOrReplaceTempView("lm_toks")
    s.sql(s"""
      |WITH bi AS (
      |  SELECT doc_id, pr.l AS l, pr.r AS r, count(*) AS c
      |  FROM (SELECT doc_id, explode(zip_with(
      |      slice(toks, 1, greatest(size(toks) - 1, 0)),
      |      slice(toks, 2, greatest(size(toks) - 1, 0)),
      |      (a, b) -> named_struct('l', a, 'r', b))) AS pr FROM lm_toks)
      |  GROUP BY doc_id, pr.l, pr.r),
      |cb AS (SELECT l, r, sum(c) AS cb FROM bi
      |       WHERE doc_id % $refMod = 0 GROUP BY l, r),
      |cu AS (SELECT l, sum(cb) AS cu FROM cb GROUP BY l),
      |sc AS (SELECT bi.doc_id, bi.c,
      |    coalesce(($Scale * cb.cb) DIV cu.cu, 0) AS s
      |  FROM bi LEFT JOIN cb ON cb.l = bi.l AND cb.r = bi.r
      |          LEFT JOIN cu ON cu.l = bi.l),
      |pd AS (SELECT doc_id, sum(c) AS n_bigrams,
      |    sum(c * s) DIV sum(c) AS lm_score FROM sc GROUP BY doc_id)
      |SELECT t.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
      |  coalesce(pd.lm_score, 0) AS lm_score
      |FROM (SELECT doc_id FROM lm_toks) t
      |LEFT JOIN pd ON pd.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin)
  }

  /** The DuckDB twin — same CTE algebra; sums cast to BIGINT (DuckDB
    * sum() widens to HUGEINT, which the driver's hasher rejects). */
  def bigramLmScoreSql(toksE: String, refMod: Int = 10): String =
    s"""WITH t AS (SELECT doc_id, $toksE AS toks FROM documents),
       |bi AS (
       |  SELECT doc_id, pr.l AS l, pr.r AS r, count(*) AS c
       |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |      j -> {'l': toks[j], 'r': toks[j + 1]})) AS pr FROM t)
       |  GROUP BY 1, 2, 3),
       |cb AS (SELECT l, r, CAST(sum(c) AS BIGINT) AS cb FROM bi
       |       WHERE doc_id % $refMod = 0 GROUP BY l, r),
       |cu AS (SELECT l, CAST(sum(cb) AS BIGINT) AS cu FROM cb GROUP BY l),
       |sc AS (SELECT bi.doc_id, bi.c,
       |    coalesce(($Scale * cb.cb) // cu.cu, 0) AS s
       |  FROM bi LEFT JOIN cb ON cb.l = bi.l AND cb.r = bi.r
       |          LEFT JOIN cu ON cu.l = bi.l),
       |pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |    CAST(sum(c * s) // sum(c) AS BIGINT) AS lm_score
       |  FROM sc GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
       |  coalesce(pd.lm_score, 0) AS lm_score
       |FROM t LEFT JOIN pd ON pd.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin
}
