package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference pipeline's four row-level "UDFs" re-expressed as pure
  * Catalyst `Column` expressions (SURVEY.md §2.4/§2.7 S1–S13) — no Scala
  * UDFs, so whole-stage codegen, constant folding, and predicate pushdown
  * all stay intact. Each function also exposes a DuckDB-SQL rendering of
  * the *same* semantics (shared keyword/pattern constants) so the driver's
  * differential oracle is generated from a single source of truth.
  *
  * Behavioral fidelity notes (vs reference `dags/dag.py`):
  *  - salary: regex on lower(title); empty currency group → the STRING
  *    'None', not SQL NULL (`dags/dag.py:32`); no match → all three NULL.
  *  - is_job_post: substring (not word) matching (`dags/dag.py:65-69`);
  *    the mixed-case negative keyword 'Looking for Data Engineering job'
  *    is dead code against a lowered title and stays dead here.
  *  - technologies: `c++` / `c#` keywords can never match `\w+` tokens
  *    (`dags/dag.py:133,139`) and stay dead here; output is canonicalized
  *    with array_sort (the reference emits Python-set order —
  *    nondeterministic; SURVEY.md §7.5.3).
  */
object JobText {

  // ---- S1: salary extraction (reference dags/dag.py:17-39) ----
  // Applied to lower(title); [A-Za-z] kept for fidelity though input is lowered.
  val salaryPattern = "([A-Za-z$€£]*)\\s*(\\d+(?:\\.\\d+)?)k\\s?-\\s?(\\d+(?:\\.\\d+)?)k"

  /** → struct(salary_currency, lower_salary, upper_salary); NULLs on no match. */
  def salaryStruct(title: Column): Column = {
    val t = lower(title)
    val cur = regexp_extract(t, salaryPattern, 1)
    val lo = regexp_extract(t, salaryPattern, 2)
    val hi = regexp_extract(t, salaryPattern, 3)
    val matched = lo =!= "" // group 2 is non-empty iff the regex matched
    struct(
      when(matched, when(trim(cur) === "", lit("None")).otherwise(trim(cur)))
        .as("salary_currency"),
      when(matched, lo.cast("double") * 1000).as("lower_salary"),
      when(matched, hi.cast("double") * 1000).as("upper_salary"))
  }

  /** DuckDB rendering of salaryStruct's three fields, given a lowered-title
    * SQL expression. regexp_extract returns '' on no-match in both engines. */
  def salarySqlFields(titleExpr: String): (String, String, String) = {
    // same pattern text works in RE2: DuckDB single-quoted strings do not
    // process backslash escapes, so NO re-escaping may be applied here
    val p = salaryPattern
    val lo = s"regexp_extract(lower($titleExpr), '$p', 2)"
    val hi = s"regexp_extract(lower($titleExpr), '$p', 3)"
    val cur = s"regexp_extract(lower($titleExpr), '$p', 1)"
    (s"CASE WHEN $lo <> '' THEN (CASE WHEN trim($cur) = '' THEN 'None' ELSE trim($cur) END) END",
     s"CASE WHEN $lo <> '' THEN CAST($lo AS DOUBLE) * 1000 END",
     s"CASE WHEN $lo <> '' THEN CAST($hi AS DOUBLE) * 1000 END")
  }

  // ---- F4: is_job_post (reference dags/dag.py:41-69) ----
  val positiveKeywords: Seq[String] = Seq(
    "hiring", "job", "position", "opening", "career", "recruitment",
    "employment", "vacancy", "opportunity", "role", "work")
  val negativeKeywords: Seq[String] = Seq(
    "help", "question", "advice", "discussion", "meta", "feedback",
    "suggestion", "Looking for Data Engineering job")

  /** Substring semantics: 'work' matches inside 'networking'. */
  def isJobPost(title: Column): Column = {
    val t = lower(title)
    val anyNeg = negativeKeywords.map(k => t.contains(lit(k))).reduce(_ || _)
    val anyPos = positiveKeywords.map(k => t.contains(lit(k))).reduce(_ || _)
    when(title.isNull || title === "", lit(false)).otherwise(!anyNeg && anyPos)
  }

  def isJobPostSql(titleExpr: String): String = {
    val t = s"lower($titleExpr)"
    val neg = negativeKeywords.map(k => s"contains($t, '${sqlEsc(k)}')").mkString(" OR ")
    val pos = positiveKeywords.map(k => s"contains($t, '${sqlEsc(k)}')").mkString(" OR ")
    s"(CASE WHEN $titleExpr IS NULL OR $titleExpr = '' THEN FALSE ELSE (NOT ($neg)) AND ($pos) END)"
  }

  // ---- S2: job position (reference dags/dag.py:97-102,115-119) ----
  // Two patterns tried in priority order; first match group wins.
  val positionPatterns: Seq[String] = Seq(
    "(Data\\s*Engineer|Machine\\s*Learning\\s*Engineer|AI\\s*Engineer|Software\\s*Engineer|Backend\\s*Engineer|Frontend\\s*Engineer|Fullstack\\s*Engineer|DevOps\\s*Engineer|Cloud\\s*Engineer|Data\\s*Scientist|Data\\s*Analyst|QA\\s*Engineer|Security\\s*Engineer|Research\\s*Scientist)",
    "(Engineer|Scientist|Manager|Developer|Architect|Analyst|Specialist|Director|Lead|Principal|Coordinator|Consultant|VP|Head)")

  // ---- S3: location (reference dags/dag.py:104-110,121-125) ----
  val locationPatterns: Seq[String] = Seq(
    "(Remote|Telecommute|Virtual|Home\\s*Office|Hybrid)",
    "(New\\s*York|San\\s*Francisco|California|London|Berlin|Toronto|Austin|Boston|Seattle|Chicago|Vancouver|Los\\s*Angeles|Dallas|Miami|Washington\\s*DC|Montreal|Paris|Singapore|Sydney|Zurich|Gdansk)",
    "(US|United\\s*States|Canada|UK|Germany|Australia|India|Singapore|Switzerland|France|Poland)")

  // ---- S4: field (reference dags/dag.py:112,127-129) ----
  val fieldPattern: String =
    "(AI|Artificial\\s*Intelligence|Data\\s*Science|Machine\\s*Learning|Deep\\s*Learning|Computer\\s*Vision|NLP|Natural\\s*Language\\s*Processing|Data\\s*Engineering|Software\\s*Engineering|Cloud\\s*Computing|DevOps|Cyber\\s*Security|Blockchain|Robotics|Big\\s*Data|Analytics)"

  /** First-match-wins priority chain ≡ the reference's `break` loop
    * (SURVEY.md O5): coalesce evaluates left-to-right, lazily. */
  private def firstMatch(title: Column, patterns: Seq[String]): Column =
    coalesce(patterns.map(p =>
      nullif(regexp_extract(trim(title), "(?i)" + p, 1), lit(""))): _*)

  private def firstMatchSql(titleExpr: String, patterns: Seq[String]): String =
    "coalesce(" + patterns.map(p =>
      s"nullif(regexp_extract(trim($titleExpr), '(?i)${sqlEsc(p)}', 1), '')")
      .mkString(", ") + ")"

  def jobPosition(title: Column): Column = firstMatch(title, positionPatterns)
  def location(title: Column): Column = firstMatch(title, locationPatterns)
  def field(title: Column): Column = firstMatch(title, Seq(fieldPattern))

  def jobPositionSql(t: String): String = firstMatchSql(t, positionPatterns)
  def locationSql(t: String): String = firstMatchSql(t, locationPatterns)
  def fieldSql(t: String): String = firstMatchSql(t, Seq(fieldPattern))

  // ---- S5: technologies (reference dags/dag.py:131-140) ----
  val techKeywords: Seq[String] = Seq(
    "python", "java", "javascript", "typescript", "c++", "c#", "ruby", "go",
    "sql", "rust", "scala", "react", "angular", "vue", "django", "flask",
    "spring", "tensorflow", "pytorch", "kubernetes", "docker", "aws", "azure",
    "gcp", "terraform", "jenkins", "redis", "mongodb", "postgresql", "mysql")

  /** `\b\w+\b` token set ∩ tech keywords, sorted for determinism.
    * `\w` = [A-Za-z0-9_] (ASCII; the keyword set is ASCII so parity holds). */
  def technologies(title: Column): Column = {
    val tokens = array_distinct(
      filter(split(lower(trim(title)), "[^A-Za-z0-9_]+"), t => t =!= ""))
    array_sort(array_intersect(tokens, array(techKeywords.map(lit): _*)))
  }

  def technologiesSql(titleExpr: String): String = {
    val kw = techKeywords.map(k => s"'${sqlEsc(k)}'").mkString("[", ", ", "]")
    s"list_sort(list_intersect(list_distinct(list_filter(regexp_split_to_array(lower(trim($titleExpr)), '[^A-Za-z0-9_]+'), t -> t <> '')), $kw))"
  }

  /** S2–S5 as one struct (reference dags/dag.py:87-92 returns a 4-key dict). */
  def jobDetailsStruct(title: Column): Column = struct(
    jobPosition(title).as("job_position"),
    location(title).as("location"),
    field(title).as("field"),
    technologies(title).as("technologies"))

  private def sqlEsc(s: String): String = s.replace("'", "''")
}
