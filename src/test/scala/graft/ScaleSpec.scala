package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Scale-technique specs: salted skew joins and bucketed co-located
  * joins — the explicit 100 TB tools the query inventory leans on. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin equals the plain inner join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1L to 1000L).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("k", "id")
    val right = Seq(("hot", "H"), ("k950", "A"), ("k999", "B"), ("miss", "M"))
      .toDF("k", "v")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "id", "v").orderBy("k", "id")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", saltBy = col("id"))
      .select("k", "id", "v").orderBy("k", "id")
    assert(salted.collect().toSeq == plain.collect().toSeq)
    assert(salted.count() == 902) // 900 hot + k950 + k999
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val wh = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "warehouse").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    (1L to 100L).map(i => (i, s"o$i")).toDF("order_id", "o")
      .write.bucketBy(4, "order_id").sortBy("order_id")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    (1L to 300L).map(i => (i % 100 + 1, i)).toDF("order_id", "item")
      .write.bucketBy(4, "order_id").sortBy("order_id")
      .option("path", s"$wh/b_items").saveAsTable("b_items")
    // force the sort-merge path: with broadcast on, tiny tables would
    // broadcast and hide the bucketing effect this test demonstrates
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_items"), "order_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle over bucketed tables, got:\n$plan")
      assert(joined.count() == 300)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_items")
  }
}
