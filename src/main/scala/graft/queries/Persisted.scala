package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialize a pure corpus function once per SF dir under /tmp and read
  * it back — the write-the-intermediate move shared by every persisted
  * artifact (shingles, MinHash signatures, simhash tiers, media, bigram
  * LM, embedding LSH sketch).
  *
  * The directory name embeds a fingerprint of the SOURCE parquet file
  * (length + mtime — a driver-side stat, no Spark job), so a regenerated
  * corpus invalidates the cache instead of silently serving stale data; a
  * changed derivation must still bump `suffix`. `_SUCCESS` gates reads: a
  * crashed write leaves no marker and the next call rebuilds. Stats and
  * the gate go through Hadoop `FileSystem` (not `java.io.File`), so the
  * gating works against whatever store the paths resolve to.
  */
object Persisted {
  import org.apache.hadoop.fs.Path

  def apply(s: SparkSession, d: String, kind: String, src: String,
            suffix: String = "")(build: => DataFrame): DataFrame = {
    val dir = s"/tmp/graft-$kind/${d.replaceAll("[^A-Za-z0-9.]", "_")}$suffix" +
      s"_${fingerprint(s, d, src)}"
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dirPath, "_SUCCESS")))
      build.write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
  }

  /** Source-parquet fingerprint (length + mtime — a driver-side stat). */
  def fingerprint(s: SparkSession, d: String, src: String): String = {
    val srcPath = new Path(s"$d/$src")
    val st = srcPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(srcPath)
    s"${st.getLen}_${st.getModificationTime / 1000}"
  }

  /** Same discipline for MULTI-TABLE index layouts (built via
    * DirSwap.swap, not a single parquet write): resolve the
    * source-fingerprinted location, build on first use, and gate reads
    * with DirSwap.requireClean on `gateSub` — a crashed build is detected
    * and re-run, never read through. `DirSwap.recover` (idempotent) runs
    * first, so debris from a crashed build/compaction resolves to a clean
    * state here instead of making every later read throw until someone
    * recovers by hand — the gate is genuinely self-healing.
    */
  def indexDir(s: SparkSession, d: String, kind: String, src: String,
               gateSub: String)(build: String => Unit): String = {
    val dir = s"/tmp/graft-$kind/${d.replaceAll("[^A-Za-z0-9.]", "_")}" +
      s"_${fingerprint(s, d, src)}"
    graft.operators.DirSwap.recover(dir)
    if (!graft.operators.DirSwap.requireClean(dir, gateSub)) build(dir)
    dir
  }
}
