package graft.queries

import org.apache.spark.sql.streaming.StreamingQuery

/** Shared harness for the fingerprint-guarded one-time streamed setups
  * (q249–q255): the physical restart-spanning stream runs ONCE per
  * (fixture, protocol version) behind a content-fingerprint marker, so
  * repeat Verify/Bench invocations pay one cheap read-back instead of a
  * re-stream, and a fixture regeneration or protocol bump (the "vN:"
  * prefix in the fingerprint) invalidates the cache.
  *
  * `setup` must either complete fully or throw — the marker is written
  * only after it returns, so a failed or timed-out run is re-attempted
  * on the next invocation instead of being cached permanently (the
  * round-13 advisor's partial-output trap).
  */
private[queries] object StreamGuard {

  /** Runs `setup` under `path` unless the marker already records `fp`;
    * wipes any stale/partial attempt first. */
  def ensure(path: String, fp: String)(setup: => Unit): Unit = {
    val marker = new java.io.File(path, "_GRAFT_INPUT_FINGERPRINT").toPath
    val current = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim == fp
    if (!current) {
      // wipe failures must be LOUD (round-13 advisor): a silently
      // half-wiped dir would be re-populated by `setup` with stale
      // files surviving under renamed batch dirs — worse than failing
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()) // null on an IO error mid-walk
            .getOrElse(sys.error(s"cannot list $f while wiping stale run"))
            .foreach(rm)
        if (!f.delete() && f.exists())
          sys.error(s"cannot delete $f while wiping stale run")
      }
      rm(new java.io.File(path)) // stale/partial attempt: start clean
      setup
      java.nio.file.Files.write(marker, fp.getBytes("UTF-8"))
      ()
    }
  }

  /** Awaits one setup stream to drain (AvailableNow) and stops it. A
    * timed-out run FAILS the setup — control flow must never reach the
    * marker write with a partial streamed output. */
  def await(q: StreamingQuery, timeoutMs: Long = 600000L): Unit =
    try {
      if (!q.awaitTermination(timeoutMs))
        sys.error(s"streamed setup timed out after ${timeoutMs / 1000}s")
    } finally q.stop()
}
