package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main (Test scope): time the q116 shard manifest
  * at range fan-out 16 (prefixLen 1) vs 256 (prefixLen 2) on the sf1
  * fixture, and confirm the outputs hash-identically. Results recorded
  * in BASELINE.md. */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("target/sf1")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(graft.functions.TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .persist()
    d.count()
    def run(p: Int): (Double, Long) = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.CorpusQueries.shardManifest(d, prefixLen = p)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val checksum = graft.queries.CorpusQueries.shardManifest(d, prefixLen = p)
        .agg(sum(expr("start_tok * 31 + shard * 7 + doc_id"))).head.getLong(0)
      (times.min, checksum)
    }
    val (t1, c1) = run(1)
    val (t2, c2) = run(2)
    println(f"[probe] prefixLen=1: $t1%.2f s, checksum $c1")
    println(f"[probe] prefixLen=2: $t2%.2f s, checksum $c2")
    println(s"[probe] identical: ${c1 == c2}")
    spark.stop()
  }
}
