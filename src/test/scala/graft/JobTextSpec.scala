package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.JobText

/** Unit tests for the reference's four "UDFs" re-expressed as Column
  * expressions, pinned to the FIXTURES.md §1 edge-case corpus (reference
  * semantics at dags/dag.py:17-140). */
class JobTextSpec extends SparkSpec {

  private def one(title: String): Row = {
    import spark.implicits._
    Seq(Option(title)).toDF("title")
      .select(
        JobText.salaryStruct(col("title")).as("sal"),
        JobText.jobDetailsStruct(col("title")).as("d"),
        JobText.isJobPost(col("title")).as("is_job"))
      .select("sal.*", "d.*", "is_job")
      .head()
  }

  test("salary with currency symbol and spaces around dash") {
    val r = one("[Hiring] Senior Data Engineer | Remote | $120k-150k | Python, AWS, Kubernetes")
    assert(r.getAs[String]("salary_currency") == "$")
    assert(r.getAs[Double]("lower_salary") == 120000.0)
    assert(r.getAs[Double]("upper_salary") == 150000.0)
  }

  test("decimal k-values scale by 1000") {
    val r = one("Job opening: ML Engineer (USD 95.5k - 120k)")
    assert(r.getAs[String]("salary_currency") == "usd") // matched on lower(title)
    assert(r.getAs[Double]("lower_salary") == 95500.0)
    assert(r.getAs[Double]("upper_salary") == 120000.0)
  }

  test("greedy currency group captures a preceding word (reference dag.py:18 regex)") {
    // `([A-Za-z$€£]*)\s*` greedily eats the word before the number — the
    // reference produces 'engineer' here, not 'None'; we match it.
    val r = one("Hiring backend engineer 80k-100k london")
    assert(r.getAs[String]("salary_currency") == "engineer")
    assert(r.getAs[Double]("lower_salary") == 80000.0)
  }

  test("empty currency group yields the STRING 'None', not SQL NULL (dag.py:32)") {
    val r = one("Hiring backend engineer (80k-100k) london")
    assert(r.getAs[String]("salary_currency") == "None")
    assert(r.getAs[Double]("lower_salary") == 80000.0)
    assert(r.getAs[Double]("upper_salary") == 100000.0)
  }

  test("no salary match yields true NULLs for all three columns") {
    val r = one("Question about data engineering careers")
    assert(r.isNullAt(r.fieldIndex("salary_currency")))
    assert(r.isNullAt(r.fieldIndex("lower_salary")))
    assert(r.isNullAt(r.fieldIndex("upper_salary")))
  }

  test("negative keyword overrides positive (question + career => false)") {
    assert(!one("Question about data engineering careers").getAs[Boolean]("is_job"))
  }

  test("substring semantics: 'work' inside 'networking' counts as positive") {
    assert(one("Networking opportunity for cloud folks").getAs[Boolean]("is_job"))
  }

  test("empty and null titles are guarded (false / all-null)") {
    assert(!one("").getAs[Boolean]("is_job"))
    val r = one(null)
    assert(!r.getAs[Boolean]("is_job"))
    assert(r.isNullAt(r.fieldIndex("job_position")))
  }

  test("position priority: specific pattern beats generic tier") {
    val r = one("[Hiring] Senior Data Engineer | Remote | $120k-150k")
    assert(r.getAs[String]("job_position") == "Data Engineer")
  }

  test("location priority: remote tier beats city tier") {
    val r = one("€60k-80k DevOps position, Berlin/Hybrid")
    assert(r.getAs[String]("location") == "Hybrid")
    assert(r.getAs[String]("field") == "DevOps")
  }

  test("technologies: intersection, sorted, dead c++/c# keywords never match") {
    val r = one("Discussion: C++ vs C# for hiring managers with python and sql")
    assert(r.getAs[collection.Seq[String]]("technologies").toSeq == Seq("python", "sql"))
  }

  test("technologies tokenization splits on non-word chars") {
    val r = one("Data analyst role (remote, US) — sql, python, tableau")
    assert(r.getAs[collection.Seq[String]]("technologies").toSeq == Seq("python", "sql"))
  }
}
