package graft

import org.apache.spark.sql.functions._
import graft.functions.AcAutomaton
import graft.queries.MiningQueries

/** Pins for the corpus-mining family (q174–q178): the Aho–Corasick
  * kernel's exact semantics, the borderless-pattern property the q174
  * oracle relies on, and the winnowing scheme's match guarantee. */
class MiningSpec extends SparkSpec {

  private def auto(pats: String*): AcAutomaton =
    new AcAutomaton(pats.map(_.getBytes("UTF-8")).toArray)

  private def counts(a: AcAutomaton, text: String): Seq[Long] =
    a.count(text.getBytes("UTF-8")).toSeq

  test("AC automaton counts every occurrence, overlaps included") {
    assert(counts(auto("aa"), "aaaa") == Seq(3L))
    assert(counts(auto("aba"), "ababa") == Seq(2L))
    assert(counts(auto("a", "aa", "aaa"), "aaaa") == Seq(4L, 3L, 2L))
  }

  test("AC automaton reports all patterns ending at a position (suffix closure)") {
    // "she" ends at the same position as "he"; neither masks the other.
    assert(counts(auto("he", "she", "his", "hers"), "ushers") ==
      Seq(1L, 1L, 0L, 1L))
  }

  test("AC automaton over UTF-8 bytes matches multi-byte patterns exactly") {
    assert(counts(auto("naïve", "ve"), "naïve naïve") == Seq(2L, 2L))
  }

  test("AC matches String.indexOf occurrence counts on random inputs") {
    val rnd = new scala.util.Random(7)
    val pats = Seq("ab", "ba", "aab", "bb", "aba")
    val a = auto(pats: _*)
    (1 to 50).foreach { _ =>
      val text = Seq.fill(40)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      val expected = pats.map { p =>
        Iterator.iterate(text.indexOf(p))(i => text.indexOf(p, i + 1))
          .takeWhile(_ >= 0).size.toLong
      }
      assert(counts(a, text) == expected, s"text=$text")
    }
  }

  test("q174's blocklist patterns are all borderless") {
    // Borderless (no proper prefix that is also a suffix) makes
    // all-occurrence counts equal non-overlapping split counts — the
    // equality the DuckDB oracle's string_split rendering needs.
    MiningQueries.BlockPatterns.foreach { p =>
      (1 until p.length).foreach { k =>
        assert(p.take(k) != p.takeRight(k), s"'$p' has border of length $k")
      }
    }
    assert(MiningQueries.BlockPatterns == MiningQueries.BlockPatterns.sorted,
      "pat_id stability requires the list to stay alphabetical")
  }

  test("graft_multi_count agrees with per-pattern split counting in SQL") {
    val df = spark.range(1).select(
      lit("the row of the row table scan and the rowdy table scan").as("text"))
    df.createOrReplaceTempView("mm_probe")
    val got = spark.sql(
      """SELECT graft_multi_count(text, array('the row', 'table scan', 'dup key'))
        |  AS c FROM mm_probe""".stripMargin)
      .head.getSeq[Long](0)
    assert(got == Seq(3L, 2L, 0L))
  }

  test("winnowing guarantee: shared token runs of >= K+W-1 share a fingerprint") {
    // Two docs sharing a 6-token run (K=3, W=4 → t=6) must share at
    // least one selected fingerprint; q175's n_shared counts exactly
    // the docs' fingerprints with df >= 2.
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot"
    val docs = Seq(
      (1L, s"zulu yankee $shared xray whiskey victor"),
      (2L, s"uniform tango $shared sierra romeo quebec papa"),
      (3L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val dir = "target/mining-spec-docs"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = MiningQueries.queries("q175_winnowing")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) >= 1L && out(2L) >= 1L, s"sharing docs must overlap: $out")
    assert(out(3L) == 0L, "disjoint doc shares nothing")
  }

  test("q176 skyline frontier is exactly the undominated set") {
    import spark.implicits._
    // Hand-built metric space: doc 1 dominates doc 2; docs 1/3/4 are
    // mutually incomparable; doc 5 ties doc 1's metrics (ties survive).
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val docs = Seq(
      mk(1L, Seq("aa", "bb", "cc", "dd")),            // n=4, ttr=1e6
      mk(2L, Seq("aa", "bb", "cc")),                  // n=3, dominated by 1
      mk(3L, Seq("aa", "aa", "bb", "cc", "dd")),      // n=5, lower ttr
      mk(4L, Seq("the", "aa", "bb", "cc", "dd", "ee", "ff")), // stopword hit
      mk(5L, Seq("ww", "xx", "yy", "zz")))            // ties doc 1
      .toDF("doc_id", "text")
    val dir = "target/mining-spec-skyline"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ids = MiningQueries.queries("q176_skyline")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L, 5L))
  }
  test("q208: the weakest boundary is a valid interior boundary with bounded similarity") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q208_text_tiling")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, b, sim) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nb >= 2 && b >= 0 && b <= nb - 2)
      assert(sim >= 0 && sim <= 1000000L)
    }
    // one row per doc with at least two full blocks
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

}
