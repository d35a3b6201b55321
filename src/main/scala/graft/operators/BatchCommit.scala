package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-id-keyed idempotent writes — the commit layer under every
  * streaming ingest here (near-dup state, curated output, the incremental
  * search index).
  *
  * foreachBatch gives at-least-once delivery: a crash between a batch's
  * side-effecting writes and the checkpoint commit re-delivers the batch.
  * Plain `mode("append")` then re-emits the batch's rows — duplicate docs
  * in the very corpus the dedup operators exist to protect. This layer
  * makes replay a no-op instead:
  *
  *  - every write lands in its own `root/batch=<id>` subdirectory, written
  *    with `mode("overwrite")` — a re-delivered batch (same id, stable
  *    under Structured Streaming's checkpoint) overwrites its own previous
  *    attempt, committed or partial, with identical content;
  *  - readers see only subdirectories holding a parquet commit marker
  *    (`_SUCCESS`), so a half-written batch dir from a crash is invisible
  *    until its replay completes it.
  *
  * No cross-table transaction is needed: each batch dir's content is a
  * deterministic function of the batch input (and, for stateful dedup,
  * of strictly-PRIOR batches' state — enforced by excluding the batch's
  * own dir from its state scan), so any interleaving of crash and replay
  * converges to the same committed state. The remaining assumption is the
  * store's atomic dir listing + rename (HDFS/local POSIX; object stores
  * want a table format instead — same caveat as DirSwap).
  */
object BatchCommit {

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def batchDir(root: String, batchId: Long): String = s"$root/batch=$batchId"

  private def committed(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_SUCCESS"))

  /** True iff `dir` holds at least one data file (any file not prefixed
    * `_`/`.`), at any partition depth — short-circuits on the first hit.
    * A `partitionBy` write of an EMPTY frame commits only `_SUCCESS`: no
    * parquet footer anywhere, so if such dirs were a scan's only inputs,
    * schema inference would throw instead of yielding empty state.
    */
  private def hasDataFile(fs: FileSystem, dir: Path): Boolean = {
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) return true
    }
    false
  }

  /** Committed `batch=*` subdirs under `root` (absent root → empty), in
    * name order. `exclude` drops one batch id — a stateful batch excludes
    * its OWN dir so recomputation on replay sees exactly the strictly-
    * prior state it saw the first time. Footer-less committed dirs (an
    * empty frame's commit — e.g. a batch replayed after compaction
    * absorbed its rows) are skipped: they contribute no rows, and as a
    * scan's sole input they'd fail schema inference rather than read as
    * empty.
    */
  def committedBatchDirs(spark: SparkSession, root: String,
                         exclude: Option[Long] = None): Seq[String] = {
    val (fs, base) = fsOf(spark, root)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).map(_.getPath)
      .filter(p => p.getName.startsWith("batch="))
      .filter(p => !exclude.exists(id => p.getName == s"batch=$id"))
      .filter(p => committed(fs, p))
      .filter(p => hasDataFile(fs, p))
      .map(_.toString).sorted.toSeq
  }

  /** Idempotent output write: overwrite `root/batch=<id>` — UNLESS that
    * dir is already committed, then keep it untouched. The guard matters
    * when state compaction has folded this batch's state rows into a
    * combined dir: a replay then recomputes an EMPTY novel set (the docs
    * match their own absorbed signatures), and overwriting the committed
    * output with it would lose the docs. Committed output was computed
    * against the correct prior state; it is never recomputed.
    *
    * The guard assumes a replayed batch recomputes IDENTICAL content — a
    * deterministic derivation over the same batch input and strictly-prior
    * state, which every ingest in this repo satisfies. It cannot detect a
    * derivation that changed BETWEEN attempts (a code upgrade mid-stream,
    * a nondeterministic upstream): the stale committed dir is silently
    * kept. Cross-version replay therefore requires a fresh checkpoint +
    * state dir — the MANIFEST pins the state LAYOUT, not the derivation.
    */
  def writeBatch(df: DataFrame, root: String, batchId: Long,
                 partitionCols: Seq[String] = Nil): Unit = {
    val (fs, _) = fsOf(df.sparkSession, root)
    val dir = batchDir(root, batchId)
    if (!committed(fs, new Path(dir))) {
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(dir)
    }
  }

  /** Committed-batches view of a batch-keyed dir: the rows every reader
    * (and the driver's oracle compare) should see. None until the first
    * batch commits.
    */
  def readCommitted(spark: SparkSession, root: String): Option[DataFrame] = {
    val dirs = committedBatchDirs(spark, root)
    // explicit basePath: sibling batch=* roots otherwise make partition
    // discovery throw CONFLICTING_DIRECTORY_STRUCTURES; with it, `batch`
    // becomes a partition column — dropped so readers see the data schema
    // regardless of which batches exist (ids and `compact` mix types)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", root).parquet(dirs: _*).drop("batch"))
  }
}
