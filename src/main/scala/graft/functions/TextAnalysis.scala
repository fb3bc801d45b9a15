package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * (builder-prompt extension surface, generalizing the reference's
  * keyword/tokenize semantics at `dags/dag.py:41-69,131-140`): language
  * identification (stopword n-gram heuristic), quality scoring
  * (length/digit/stopword ratios), token counting (whitespace + BPE-ish
  * regex), and document fingerprinting (rolling hash).
  *
  * All pure Catalyst `Column` expressions — no UDFs, so 100 TB of text
  * stays inside whole-stage codegen — with DuckDB-SQL renderings derived
  * from the same constants for the differential oracle.
  *
  * Portability invariants (must hold in BOTH engines for hash-equality):
  *  - token hash = first 12 hex digits of md5 → 48-bit int; Spark
  *    `conv(hex,16,10)`, DuckDB `CAST('0x'||hex AS BIGINT)`.
  *  - rolling fold is `(acc*31 + h) mod 1e9+7`: acc < 2^30, h < 2^48 →
  *    no 64-bit overflow. Spark `aggregate(init=0)` ≡ DuckDB
  *    `list_reduce` with an explicit prepended 0 (list_reduce seeds from
  *    the first element, aggregate from init).
  *  - ratio arithmetic is single IEEE divisions of exact integer counts,
  *    combined in an identical association order in both renderings.
  */
object TextAnalysis {

  // ---- tokenization ----

  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  def tokensSql(e: String): String =
    s"list_filter(string_split_regex(lower(trim($e)), '\\s+'), t -> t <> '')"

  // ---- language ID: stopword-hit counts per candidate language ----

  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "los", "las", "y", "es", "uno", "una", "para", "en", "con"))

  /** #tokens that are stopwords of `lang` (multiset count, not distinct). */
  def stopwordHits(toks: Column, lang: String): Column = {
    val words = stopwords.toMap.apply(lang)
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
  }

  def stopwordHitsSql(toksE: String, lang: String): String = {
    val words = stopwords.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toksE, t -> list_contains($words, t)))"
  }

  /** Argmax language with deterministic tie-break (declaration order);
    * 'unknown' when no stopword hits at all. Expects the four score
    * columns s_en/s_de/s_fr/s_es to be in scope. */
  def predLang(en: Column, de: Column, fr: Column, es: Column): Column =
    when(greatest(en, de, fr, es) === 0, lit("unknown"))
      .when(en >= greatest(de, fr, es), lit("en"))
      .when(de >= greatest(fr, es), lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))

  def predLangSql(en: String, de: String, fr: String, es: String): String =
    s"""CASE WHEN greatest($en, $de, $fr, $es) = 0 THEN 'unknown'
       | WHEN $en >= greatest($de, $fr, $es) THEN 'en'
       | WHEN $de >= greatest($fr, $es) THEN 'de'
       | WHEN $fr >= $es THEN 'fr' ELSE 'es' END""".stripMargin.replace("\n", "")

  // ---- quality scoring ----

  /** Sum of token lengths (exact int fold — order-free). */
  def sumTokenLen(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t))

  def sumTokenLenSql(toksE: String): String =
    s"list_reduce(list_concat([0], list_transform($toksE, t -> len(t))), (acc, x) -> acc + x)"

  def digitCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[0-9]"), lit(0)))

  def digitCountSql(e: String): String =
    s"len(regexp_extract_all(lower($e), '[0-9]'))"

  /** Composite quality score in [0,1]; identical association order in the
    * SQL rendering below — do not "simplify" one without the other. */
  def qualityScore(nTokens: Column, digitRatio: Column, stopRatio: Column): Column =
    least(lit(1.0), nTokens.cast("double") / 100.0) * 0.5 +
      (lit(1.0) - least(lit(1.0), digitRatio * 5.0)) * 0.3 +
      least(lit(1.0), stopRatio * 10.0) * 0.2

  def qualityScoreSql(nTokens: String, digitRatio: String, stopRatio: String): String =
    s"least(1.0, CAST($nTokens AS DOUBLE) / 100.0) * 0.5" +
      s" + (1.0 - least(1.0, ($digitRatio) * 5.0)) * 0.3" +
      s" + least(1.0, ($stopRatio) * 10.0) * 0.2"

  // ---- token counting ----

  /** BPE-ish segment count: alpha runs, digit runs, single other glyphs. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpePattern), lit(0)))

  def bpeTokenCountSql(e: String): String =
    s"len(regexp_extract_all(lower($e), '$bpePattern'))"

  // ---- PII / URL scrubbing (training-data hygiene) ----

  /** (pattern, replacement) chain applied in order — order matters:
    * emails before bare domains would, e.g., double-redact. Patterns are
    * RE2-safe (no backrefs/lookarounds) so Java regex and DuckDB agree. */
  val scrubRules: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\+?\\d[\\d -]{7,}\\d\\b" -> "<PHONE>")

  def scrub(text: Column): Column =
    scrubRules.foldLeft(text) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  def scrubSql(e: String): String =
    scrubRules.foldLeft(e) { case (acc, (p, r)) =>
      // pattern used verbatim: DuckDB single-quoted strings don't process
      // backslash escapes, so no re-escaping may be applied
      s"regexp_replace($acc, '$p', '$r', 'g')"
    }

  // ---- document fingerprinting ----

  val fpMod = 1000000007L

  /** 48-bit md5-derived hash of one token (portable across engines). */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 12), 16, 10).cast("long")

  def tokenHashSql(tE: String): String =
    s"CAST('0x' || substr(md5($tE), 1, 12) AS BIGINT)"

  /** Order-sensitive rolling-hash fingerprint of the token sequence.
    *
    * Resolves to the native codegen'd
    * [[graft.functions.FingerprintExpr]] — a JIT'd fold instead of the
    * interpreted `aggregate` HOF (bit-identical contract in that
    * kernel's scaladoc). */
  def fingerprint(toks: Column): Column =
    call_function("graft_fingerprint", toks)

  def fingerprintSql(toksE: String): String =
    s"list_reduce(list_concat([CAST(0 AS BIGINT)], list_transform($toksE, t -> ${tokenHashSql("t")})), (acc, x) -> (acc * 31 + x) % $fpMod)"
}
