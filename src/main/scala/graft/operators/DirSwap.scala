package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Crash-safe, multi-table directory swap — the maintenance primitive under
  * every compaction/retrain job here (`IncrementalIndex.compact`,
  * `DocStreams.compactState`, `VectorStreams.retrainIndex`).
  *
  * The round-6 version was two bare `java.io.File.renameTo` calls per table:
  * a crash between them stranded the live dir in `*_old`, and readers that
  * gate on `live/_SUCCESS` silently treated the surviving state as "no prior
  * state" — for the near-dup store that means the entire accumulated dedup
  * index is ignored and every subsequent doc re-admitted. Multi-table jobs
  * (retrain's cells+centroids) additionally had a window that persisted a
  * MIXED generation: corpus re-celled by new centroids, queries still
  * routing by the old ones. This rewrite closes both:
  *
  *  - All new generations are fully materialized ASIDE (`sub_next`, gated
  *    by the writer's `_SUCCESS`) before anything is renamed — so there is
  *    always at least one complete generation of every table on disk.
  *  - A single `_SWAP_PENDING` marker file, created atomically (write tmp +
  *    rename) AFTER all aside writes and removed AFTER all renames, makes
  *    every crash window detectable and assigns it a deterministic
  *    recovery: marker present → roll FORWARD (every listed table to its
  *    complete `_next`); no marker → roll BACK (drop aside/retired
  *    leftovers, live generation wins). Recovery is idempotent and runs
  *    automatically at the start of every swap; readers call
  *    `requireClean` and fail loudly mid-window instead of guessing.
  *  - Paths go through Hadoop `FileSystem` (resolved per-path, so the same
  *    code serves `file:`, `hdfs:`, etc.), not `java.io.File` — the
  *    round-6 primitive was local-filesystem-only. Caveat that stays: the
  *    swap's atomicity is that of the store's directory rename (atomic on
  *    HDFS/local POSIX; NOT on S3-style object stores — front those with a
  *    table format instead of this primitive).
  *
  * Concurrency contract (unchanged): one maintenance job at a time, not
  * racing a concurrent writer — run in the ingest's maintenance window.
  * Readers racing a swap see either generation (the rename is atomic) or
  * fail loudly via `requireClean`.
  */
object DirSwap {

  private val Marker = "_SWAP_PENDING"

  private def fsOf(p: Path): FileSystem =
    p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)

  private def complete(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_SUCCESS"))

  /** Atomically swap `subs` of `baseDir` to new generations. Each write
    * callback materializes its table into the aside path it is given (and
    * may read the live dir — nothing is renamed until every write has
    * completed and produced `_SUCCESS`).
    */
  def swap(baseDir: String, subs: Seq[(String, String => Unit)]): Unit = {
    val base = new Path(baseDir)
    val fs = fsOf(base)
    recover(baseDir) // a prior crashed swap must resolve before this one
    subs.foreach { case (sub, write) =>
      val next = new Path(base, s"${sub}_next")
      fs.delete(next, true)
      write(next.toString) // reads the live dir; completes before any rename
      require(complete(fs, next), s"aside write for $sub left no _SUCCESS")
    }
    writeMarker(fs, base, subs.map(_._1))
    subs.foreach { case (sub, _) => promote(fs, base, sub) }
    fs.delete(new Path(base, Marker), false)
  }

  /** Single-table convenience. */
  def swapOne(baseDir: String, sub: String)(write: String => Unit): Unit =
    swap(baseDir, Seq(sub -> write))

  /** Rename live→old, next→live, drop old. Safe to re-run after a crash at
    * any point (each step checks what remains to be done).
    */
  private def promote(fs: FileSystem, base: Path, sub: String): Unit = {
    val live = new Path(base, sub)
    val next = new Path(base, s"${sub}_next")
    val old = new Path(base, s"${sub}_old")
    if (fs.exists(next)) {
      require(complete(fs, next), s"marker present but $sub's aside generation is incomplete")
      if (fs.exists(live)) {
        fs.delete(old, true)
        require(fs.rename(live, old), s"rename $live -> $old failed")
      }
      require(fs.rename(next, live), s"rename $next -> $live failed")
    }
    fs.delete(old, true)
  }

  /** Resolve any crashed swap under `baseDir` to exactly one complete
    * generation per table. Marker present → the aside generations were
    * complete when the crash hit, so roll FORWARD (finish the renames for
    * every table the marker lists). No marker → renames never started, so
    * roll BACK: delete aside leftovers; a live dir stranded in `*_old` by
    * the pre-marker era (or a rolled-back aside) is restored if the live
    * dir is gone. Idempotent; called automatically by `swap`.
    */
  def recover(baseDir: String): Unit = {
    val base = new Path(baseDir)
    val fs = fsOf(base)
    if (!fs.exists(base)) return
    val marker = new Path(base, Marker)
    if (fs.exists(marker)) {
      readMarker(fs, marker).foreach(promote(fs, base, _))
      fs.delete(marker, false)
    } else {
      fs.listStatus(base).map(_.getPath).foreach { p =>
        val name = p.getName
        if (name.endsWith("_next") || name.endsWith("_compacting")) fs.delete(p, true)
        else if (name.endsWith("_old")) {
          val live = new Path(base, name.stripSuffix("_old"))
          if (!fs.exists(live)) require(fs.rename(p, live), s"rollback rename $p -> $live failed")
          else fs.delete(p, true)
        }
      }
    }
  }

  /** Reader-side guard: throw if `baseDir` has a swap in flight instead of
    * letting the caller read through it. A pending marker always throws —
    * between a multi-table swap's renames BOTH live dirs exist but belong
    * to different generations, so "live looks complete" proves nothing.
    * Without a marker, swap debris next to an incomplete live dir throws
    * (a pre-marker-era crash stranded the live generation in `*_old`).
    * Returns true if a complete live generation exists, false if there is
    * genuinely none.
    */
  def requireClean(baseDir: String, sub: String): Boolean = {
    val base = new Path(baseDir)
    val fs = fsOf(base)
    if (!fs.exists(base)) return false
    if (fs.exists(new Path(base, Marker)))
      throw new IllegalStateException(
        s"$baseDir has a pending directory swap (crashed maintenance job?) — " +
          s"run DirSwap.recover before reading")
    val liveOk = complete(fs, new Path(base, sub))
    if (!liveOk && (fs.exists(new Path(base, s"${sub}_old")) ||
        fs.exists(new Path(base, s"${sub}_next"))))
      throw new IllegalStateException(
        s"$baseDir/$sub is mid-swap (crashed maintenance job?) — " +
          s"run DirSwap.recover before reading")
    liveOk
  }

  /** Stamp `dir` complete (`_SUCCESS`) by hand — for aside writes whose
    * content lands in a SUBDIRECTORY of the aside path (batch-keyed
    * layouts put the parquet commit marker inside `batch=.../`), so the
    * swap's completeness gate still has a root marker to check.
    */
  def markComplete(dir: String): Unit = {
    val p = new Path(dir, "_SUCCESS")
    fsOf(p).create(p, true).close()
  }

  private def writeMarker(fs: FileSystem, base: Path, subs: Seq[String]): Unit = {
    val tmp = new Path(base, s"$Marker.tmp")
    val out = fs.create(tmp, true)
    try out.write(subs.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val marker = new Path(base, Marker)
    fs.delete(marker, false)
    require(fs.rename(tmp, marker), s"marker rename failed under $base")
  }

  private def readMarker(fs: FileSystem, marker: Path): Seq[String] = {
    val in = fs.open(marker)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }
}
