package graft

import graft.operators.TextExtract
import graft.sources.ZipfCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade probe for the extraction stage (round 17): wrapper synthesis +
  * block-walk extraction + the per-block audit over n Zipf docs —
  * `sbt "runMain graft.ExtractProbe 5000"` vs 50000 vs 500000. The whole
  * stage is a row-local projection, so each phase must scale ~n with a
  * scheduler floor; one JSON line for the BASELINE.md table.
  */
object ExtractProbe {
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

    val docs = ZipfCorpus.synth(spark.range(n.toLong).select(col("id").as("doc_id")))
      .select("doc_id", "text").localCheckpoint()
    val pages = TextExtract.wrapped(docs).localCheckpoint()
    val (exCnt, exSec) = timed(TextExtract.extract(pages)
      .agg(sum(length(col("text")))).collect()(0).getLong(0))
    val (blkCnt, blkSec) = timed(TextExtract.blocks(pages).count())
    val (_, statSec) = timed(TextExtract.stats(pages).collect())
    println(f"""{"n":$n,"extract_chars":$exCnt,"extract_sec":$exSec%.2f,"blocks":$blkCnt,"blocks_sec":$blkSec%.2f,"stats_sec":$statSec%.2f}""")
    spark.stop()
  }
}
