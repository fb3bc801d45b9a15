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
