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
}
