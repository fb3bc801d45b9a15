package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.JobText

/** The reference's transform task (`process_job_posts`, reference
  * `dags/dag.py:294-365`) as ONE lazy Catalyst chain (SURVEY.md §3 entry
  * point 2): dedup → salary extraction → job-details expansion → validity
  * filter. Where the reference eagerly materializes a pandas frame per
  * step on one thread, this plan is fully distributed, codegen'd, and
  * column-pruned — at 100 TB each step is a narrow transformation with no
  * shuffle except the dedup, which shuffles once on the dedup key.
  *
  * Divergences from the reference (intended-semantics; SURVEY.md §7.5.1):
  *  - dedup keeps the FIRST row in `orderCol` order (the reference relies
  *    on pandas scan order, `dags/dag.py:322`); we make the order explicit.
  *  - the salary-fill positional-misalignment bug (`dags/dag.py:334-338`)
  *    is not reproduced: extracted values stay row-aligned.
  */
object Transform {

  /** S11: guarded string→int for `comments_count` (reference
    * `dags/dag.py:233-237`): leading token iff all-digits (`isdigit`),
    * else 0. The digit guard (not try_cast) mirrors isdigit exactly and
    * is ANSI-mode-safe in both engines. */
  def commentsCount(raw: Column): Column = {
    val tok = split_part(raw, lit(" "), lit(1))
    when(tok.rlike("^[0-9]+$"), tok.cast("int")).otherwise(lit(0))
  }

  /** D1: keep-first dedup on (post_id, title), first = min(orderCol).
    * Scale note: a window over (post_id, title) is ONE hash shuffle on the
    * dedup key — same cost as dropDuplicates but with a deterministic
    * keeper, which the oracle compare requires. */
  def dedupFirst(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Full transform chain: posts-shaped input (post_id, title, url, author,
    * created_datetime, upvotes, comments_text, subreddit + orderCol) →
    * the 15-column posts relation of reference `dags/dag.py:494-510`. */
  def apply(raw: DataFrame, orderCol: String): DataFrame = {
    val deduped = dedupFirst(raw, Seq("post_id", "title"), Seq(orderCol))
    deduped
      .withColumn("comments_count", commentsCount(col("comments_text")))
      .withColumn("sal", JobText.salaryStruct(col("title")))
      .select(col("*"), col("sal.*")).drop("sal")
      .withColumn("d", JobText.jobDetailsStruct(col("title")))
      .select(col("*"), col("d.*")).drop("d")
      // F5: keep job posts OR anything with an extracted salary
      // (reference dags/dag.py:348-349); predicate fused, helper column
      // never materialized.
      .where(JobText.isJobPost(col("title")) ||
             col("lower_salary").isNotNull || col("upper_salary").isNotNull)
      .drop("comments_text")
  }
}
