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
  * crashed write leaves no marker and the next call rebuilds.
  */
object Persisted {
  def apply(s: SparkSession, d: String, kind: String, src: String,
            suffix: String = "")(build: => DataFrame): DataFrame = {
    val f = new java.io.File(s"$d/$src")
    val fp = s"${f.length}_${f.lastModified / 1000}"
    val dir = s"/tmp/graft-$kind/${d.replaceAll("[^A-Za-z0-9.]", "_")}${suffix}_$fp"
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      build.write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
  }
}
