package graft.sources

import org.apache.spark.sql.SparkSession

/** Snapshot identity for a fixture directory, used to key the
  * cross-query memos (GraphQueries' edge lists, DedupQueries' title
  * chain, PostsProxy's persisted proxy).
  *
  * The memos deliberately survive `spark.catalog.clearCache()` (their
  * localCheckpoint blocks are RDD-level storage), which means a plain
  * (session, dir) key goes stale if the files AT THE SAME PATH are
  * regenerated within one JVM — e.g. a harness rebuilding target/sf1
  * between sweeps. Folding every top-level parquet file's
  * (name, length, mtime) into the key makes regeneration a memo MISS
  * instead of a silent stale hit, and the eviction pass in [[key]]
  * releases the superseded entries (plus entries of stopped sessions,
  * so a long-lived JVM cycling sessions never pins a dead context).
  *
  * Cost: one directory listing per call — local-FS metadata, the same
  * order of work as the scan planner's own file listing.
  */
object FixtureStamp {

  /** Fold of (name, length, mtime) over `dir`'s top-level parquet
    * files. 0 for a missing/empty directory (still a stable key). */
  def of(dir: String): Long = {
    val d = new java.io.File(
      if (dir.startsWith("file:")) new java.net.URI(dir).getPath else dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    files.foldLeft(1125899906842597L) { (a, f) =>
      a * 31 + f.getName.hashCode.toLong * 1315423911L +
        f.length() * 2654435761L + f.lastModified()
    }
  }

  /** Per-FILE stamp suffix (length + mtime) for single-file memos
    * (FanOut's row-group counts). Best-effort: unchanged key when the
    * file cannot be stat'ed. */
  def fileToken(pathUri: String): String =
    try {
      val f = new java.io.File(
        if (pathUri.startsWith("file:")) new java.net.URI(pathUri).getPath
        else pathUri)
      s"$pathUri#${f.length()}#${f.lastModified()}"
    } catch { case scala.util.control.NonFatal(_) => pathUri }

  /** Build the (session, dir, stamp) memo key AND evict stale entries:
    * stopped sessions, and superseded stamps for this (session, dir). */
  def key[V](m: java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long), V],
             s: SparkSession, dir: String): (SparkSession, String, Long) = {
    val st = of(dir)
    val it = m.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k._1.sparkContext.isStopped || ((k._1 eq s) && k._2 == dir && k._3 != st))
        it.remove()
    }
    (s, dir, st)
  }
}
