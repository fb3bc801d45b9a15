package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe swap for the foreachBatch full-store sinks (round-8
  * advisor, medium): the old `deleteQuietly(dst); moveDirectory(tmp,
  * dst)` swap had a window with NO store on disk, and a crash between
  * the swap and the streaming checkpoint commit replayed the batch
  * into a non-idempotent re-aggregating merge (double count) or onto
  * the lost store (total loss).
  *
  * Layout: `root/` holds immutable version directories `v<batchId
  * zero-padded>/` (each a complete parquet store) plus a pointer file
  * `_CURRENT` whose content is `<version-dir-name>\n<batchId>`. The
  * pointer flip is the ONLY commit point and is atomic (tmp file +
  * `ATOMIC_MOVE` rename — same-directory file rename, atomic on POSIX;
  * the object-store deployment of this helper would use a conditional
  * put). Readers resolve through the pointer, so they always see a
  * complete store: either the previous version or the new one, never
  * an in-between.
  *
  * Replay safety (at-least-once foreachBatch → effectively-once):
  *  - crash BEFORE the flip → pointer still names the old version; the
  *    replayed batch deletes its own partial `v<id>` dir, re-merges
  *    from the OLD store, and flips — same result as a clean run;
  *  - crash AFTER the flip but before the checkpoint commit → the
  *    replayed batch sees `committedBatch >= batchId` and SKIPS the
  *    merge entirely — no double count.
  * (Relies on Structured Streaming's contract that a replayed batchId
  * carries the same data — true for replayable sources.)
  */
object VersionedStore {

  private def pointer(root: File) = new File(root, "_CURRENT")

  private def versionName(ver: Long) = f"v$ver%012d"

  private def versionOf(dirName: String): Long = dirName.drop(1).toLong

  /** (live version dir, last committed batchId), if any commit exists. */
  def current(rootPath: String): Option[(String, Long)] = {
    val pf = pointer(new File(rootPath))
    if (!pf.exists()) None
    else {
      val lines = Files.readAllLines(pf.toPath)
      Some((new File(rootPath, lines.get(0)).getPath, lines.get(1).toLong))
    }
  }

  /** True iff `batchId` (or a later one) is already committed — the
    * replayed-batch skip test for NON-idempotent merges. Only
    * meaningful within one streaming-checkpoint lineage (batchIds
    * reset with a fresh checkpoint — the same caveat Structured
    * Streaming's own exactly-once contract carries). */
  def committed(rootPath: String, batchId: Long): Boolean =
    current(rootPath).exists(_._2 >= batchId)

  /** The live store as a DataFrame, resolved through the pointer. */
  def read(spark: SparkSession, rootPath: String): Option[DataFrame] =
    current(rootPath).map { case (dir, _) => spark.read.parquet(dir) }

  /** Write a new version via `write(versionDir)`, then flip the
    * pointer LAST. A replay of the same batchId overwrites its own
    * version dir, so a partial write from a crashed attempt can never
    * surface. GC (after the flip) retains the immediately-preceding
    * version: the new version's plan may lazily re-read it (an evicted
    * cache block), and a reader that resolved the pointer just before
    * the flip may still be scanning it. Older versions go. */
  def commit(rootPath: String, batchId: Long)(write: String => Unit): Unit = {
    val root = new File(rootPath)
    root.mkdirs()
    val prev = current(rootPath).map(c => new File(c._1).getName)
    // version numbers are commit-ordinal, NOT batchId: batchIds reset
    // with a fresh checkpoint, and naming by batchId would rewrite the
    // LIVE dir in place (pointer → partial data on crash). The next
    // ordinal's dir is unreferenced until the flip, and a crashed
    // attempt's partial dir is simply rewritten by the retry.
    val vname = versionName(prev.map(versionOf(_) + 1).getOrElse(0L))
    val vdir = new File(root, vname)
    org.apache.commons.io.FileUtils.deleteQuietly(vdir)
    write(vdir.getPath)
    val tmp = new File(root, "._CURRENT.tmp")
    Files.write(tmp.toPath,
      s"$vname\n$batchId\n".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, pointer(root).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Option(root.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        f.getName < vname && !prev.contains(f.getName))
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly(_))
  }
}
