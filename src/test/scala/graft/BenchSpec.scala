package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-parse contract of Bench's stdout: after three rounds
  * of `parsed: null` (a full per-query map line pushing the summary out
  * of the driver's ~2 KB stdout tail), the summary must be the only
  * payload line and must stay FAR inside the tail window at any
  * declared-surface size — this spec breaks the build before a new
  * query surface can silently regrow the line. */
class BenchSpec extends AnyFunSuite {

  private def line(n: Int): String = {
    // worst realistic case: every declared query name at its true
    // length, pessimal timings (5 digits before the decimal)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = (0 until n).map(i => names(i % names.size) -> 99999.99)
    Bench.summaryLine(results, total = 99999.99 * n, nFailed = n, "sf999")
  }

  test("summary line stays far inside the driver's 2 KB tail at any surface size") {
    for (n <- Seq(1, SparkEntry.queries.size, 1000)) {
      val l = line(n)
      assert(l.length < 600, s"summary grew to ${l.length} bytes at n=$n:\n$l")
      assert(!l.contains("\n"))
    }
  }

  test("summary line is a single well-formed JSON object with the driver's headline fields") {
    val l = line(SparkEntry.queries.size)
    assert(l.startsWith("{") && l.endsWith("}"))
    for (f <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
                  "\"sf\":", "\"n_queries\":", "\"n_failed\":", "\"slowest\":"))
      assert(l.contains(f), s"missing $f in $l")
    // at most 3 slowest entries — the size bound's load-bearing cap
    val slowest = l.substring(l.indexOf("\"slowest\":") + 10)
    assert(slowest.substring(0, slowest.indexOf("}")).count(_ == ':') <= 3)
    // balanced braces (cheap well-formedness proxy without a JSON dep)
    assert(l.count(_ == '{') == l.count(_ == '}'))
    // locale-independent decimal point
    assert(Bench.fmt(1.5) == "1.50")
  }

  /** Pins the round-9 contention guard: min-of-2 recorded 4× phantom
    * spikes in the round-8 driver run (q130 5.56 s vs 1.40 s judge
    * isolation). If the two samples disagree >2×, ONE more is taken. */
  test("minWithRetry takes a 3rd sample only when the first two disagree >2x") {
    def feed(xs: Double*): () => Option[Double] = {
      val it = xs.iterator
      () => if (it.hasNext) Some(it.next()) else fail("sampled more than provided")
    }
    // agreement within 2x: exactly two samples, min reported
    assert(Bench.minWithRetry(feed(1.0, 1.9)) == 1.0)
    // >2x disagreement: third sample drawn, min of all three
    assert(Bench.minWithRetry(feed(5.0, 1.0, 0.8)) == 0.8)
    assert(Bench.minWithRetry(feed(1.0, 5.0, 4.0)) == 1.0)
    // exactly 2x is agreement (strict >): no third sample
    assert(Bench.minWithRetry(feed(1.0, 2.0)) == 1.0)
    // failures: one failed run never masks the other; all failed → -1
    val it = Iterator(Some(3.0), None)
    assert(Bench.minWithRetry(() => it.next()) == 3.0)
    val it2 = Iterator(None, None)
    assert(Bench.minWithRetry(() => it2.next()) == -1.0)
  }
}
