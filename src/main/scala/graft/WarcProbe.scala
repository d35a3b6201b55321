package graft

import graft.sources.Warc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stream-walk decade probe — `sbt "runMain graft.WarcProbe 5000"` vs
  * 50000 vs 500000; one JSON line per run for the BASELINE.md table.
  *
  * The claim under test: `Warc.parseStream`'s offsets fold is LINEAR in
  * blob content — the iteration bound is the version-string count
  * (records + decoys), each iteration advances by one Content-Length
  * frame with a dynamic-offset `locate` (no tail copies), and the
  * whole walk is row-local (no shuffle), so wall must track total blob
  * chars ~linearly and the scheduler floor dominates at small n. The
  * probe parses the variable-record fixture (1..5 records/blob, decoy
  * payloads), reports records and total blob/body chars as the size
  * denominators, and then drives the full crawl head (parse →
  * canonicalize → latest-fetch dedup) whose only exchange is the
  * narrow-row dedup aggregate's.
  */
object WarcProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val ids = spark.range(n.toLong).select(col("id").as("doc_id"))
      .localCheckpoint()
    val blobs = Warc.streamRecords(ids).localCheckpoint()
    val blobChars = blobs.agg(sum(length(col("blob")))).collect()(0).getLong(0)

    // 1. the framing walk alone (fold + explode + per-record fields)
    val (parseAgg, parseSec) = timed(
      Warc.parseStream(blobs)
        .agg(count(lit(1)).as("recs"), sum(col("body_chars")).as("chars"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("oks"))
        .collect()(0))
    require(parseAgg.getLong(2) == parseAgg.getLong(0), "all records ok")

    // 2. the full crawl head: parse -> canonical url -> latest-fetch dedup
    val (nUrls, headSec) = timed(
      Warc.dedupLatest(Warc.parseStream(blobs)).count())

    println(s"""{"probe":"warc_stream","n":$n,"blob_chars":$blobChars,""" +
      s""""records":${parseAgg.getLong(0)},"body_chars":${parseAgg.getLong(1)},""" +
      s""""parse_sec":$parseSec,"head_sec":$headSec,"dedup_urls":$nUrls}""")
    spark.stop()
  }
}
