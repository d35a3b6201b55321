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
    * `_`/`.`). A `partitionBy` write of an EMPTY frame commits only
    * `_SUCCESS`: no parquet footer anywhere, so if such dirs were a
    * scan's only inputs, schema inference would throw instead of
    * yielding empty state. Listing cost is hot-path-aware (this runs
    * per committed dir per micro-batch): the ONE direct listing decides
    * flat dirs (the common non-partitioned layout: data files sit at
    * the top) with no recursion; only dirs whose top level is all
    * subdirs/markers (partitioned layouts) pay a recursive iterator,
    * and that short-circuits at the first leaf file.
    */
  private def hasDataFile(fs: FileSystem, dir: Path): Boolean = {
    val top = fs.listStatus(dir)
    if (top.exists(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")))
      return true
    if (!top.exists(_.isDirectory)) return false // flat and empty
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
    * dir is already committed (then keep it untouched) or the id appears
    * in the root's `_FOLDED` ledger (then its rows already live in a
    * consolidated dir — see `recordFolded`). The committed-dir guard
    * matters when state compaction has folded this batch's state rows
    * into a combined dir: a replay then recomputes an EMPTY novel set
    * (the docs match their own absorbed signatures), and overwriting the
    * committed output with it would lose the docs. Committed output was
    * computed against the correct prior state; it is never recomputed.
    *
    * The ledger closes the case the committed-dir check cannot see: a
    * fold DELETES the per-batch dirs it absorbs, so a batch
    * crash-replayed from before the fold finds no `batch=<id>` dir and —
    * without the ledger — would re-write its rows NEXT TO their folded
    * copy (for the vector indexes, possibly assigned under a retrained
    * quantizer). With it, replay of an absorbed batch is a no-op on
    * state, uniformly with the committed case.
    *
    * Both guards assume a replayed batch recomputes IDENTICAL content — a
    * deterministic derivation over the same batch input and strictly-prior
    * state, which every ingest in this repo satisfies. They cannot detect
    * a derivation that changed BETWEEN attempts (a code upgrade
    * mid-stream, a nondeterministic upstream): the stale committed/folded
    * rows are silently kept. Cross-version replay therefore requires a
    * fresh checkpoint + state dir — the MANIFEST pins the state LAYOUT,
    * not the derivation.
    */
  def writeBatch(df: DataFrame, root: String, batchId: Long,
                 partitionCols: Seq[String] = Nil): Unit = {
    val (fs, _) = fsOf(df.sparkSession, root)
    val dir = batchDir(root, batchId)
    if (!committed(fs, new Path(dir)) &&
        !foldedIds(df.sparkSession, root).contains(batchId)) {
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(dir)
    }
  }

  /** Post-write guard for a foreachBatch body: verify this batch's dir is
    * still committed (or ledgered as folded — a replay whose write was
    * absorbed, or an in-callback compaction cadence that just folded it)
    * BEFORE the callback returns and the checkpoint advances. The
    * ingest-side `Lease.check` runs at batch START; a maintenance job
    * acquiring the lease mid-batch could swap away the generation the
    * batch just wrote into — without this guard the callback would return
    * cleanly, the checkpoint would advance, and the batch's rows would be
    * permanently lost (neither committed nor replayable). Failing here
    * instead leaves the checkpoint unadvanced, and the post-maintenance
    * replay recomputes against the new generation idempotently.
    */
  def requireIntact(spark: SparkSession, root: String, batchId: Long): Unit = {
    val (fs, _) = fsOf(spark, root)
    if (!committed(fs, new Path(batchDir(root, batchId))) &&
        !foldedIds(spark, root).contains(batchId))
      throw new IllegalStateException(
        s"$root/batch=$batchId vanished between write and checkpoint commit " +
          "(a maintenance swap raced this batch?) — failing loudly so the " +
          "batch replays instead of silently losing its rows")
  }

  private val FoldedFile = "_FOLDED"

  /** Batch ids absorbed by a fold of this root (empty when no fold ever
    * ran). One id per line; `_`-prefixed, so dir listings and data scans
    * ignore it.
    */
  def foldedIds(spark: SparkSession, root: String): Set[Long] = {
    val (fs, base) = fsOf(spark, root)
    val p = new Path(base, FoldedFile)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map(_.trim.toLong).toSet
      finally in.close()
    }
  }

  /** Numeric ids of the committed batch dirs currently under `root` —
    * what a fold is about to absorb (`base`/`compact` generations carry
    * no replayable id and are skipped).
    */
  def committedNumericIds(spark: SparkSession, root: String): Seq[Long] =
    committedBatchDirs(spark, root)
      .map(_.split("=").last)
      .flatMap(s => scala.util.Try(s.toLong).toOption)

  /** Write `newRoot/_FOLDED` = `ids` ∪ the ids already folded at
    * `prevRoot` — called by every fold (compaction/retrain) on its ASIDE
    * dir before the swap, so the ledger rides the generation it
    * describes. Carrying the previous generation's ids forward keeps
    * replay of a long-stopped stream safe across multiple folds.
    */
  def recordFolded(spark: SparkSession, newRoot: String, prevRoot: String,
                   ids: Seq[Long]): Unit = {
    val all = (foldedIds(spark, prevRoot) ++ ids).toSeq.sorted
    if (all.nonEmpty) {
      val (fs, base) = fsOf(spark, newRoot)
      val tmp = new Path(base, s"$FoldedFile.tmp")
      val out = fs.create(tmp, true)
      try out.write(all.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val dst = new Path(base, FoldedFile)
      fs.delete(dst, false)
      require(fs.rename(tmp, dst), s"folded-ledger rename failed under $newRoot")
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
