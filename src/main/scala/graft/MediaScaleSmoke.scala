package graft

import graft.operators.{Dedup, Multimodal, Search}
import graft.sources.ZipfCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot scale measurement for the round-11 second-sitting multimodal
  * operators and the retrieval-eval job — the ScaleSmoke treatment the
  * text/dedup families got (BASELINE.md decade tables), applied to the
  * frame-fingerprint pipeline: `sbt "runMain graft.MediaScaleSmoke 5000"`
  * vs `... 50000` — a 10× media growth should move every phase ~10×
  * (decode is per-payload, pairs/near-dup are bucket-bounded joins), and
  * the printed bucket statistics show WHY the joins stay linear: the
  * ahash pigeonhole bands and the frame-hash inverted index must keep
  * their max bucket a stable fraction of media count, never ~all of it.
  *
  * Phases: image aHash decode, hamming-≤2 aHash pairs (pigeonhole-banded),
  * per-frame video fingerprints, video near-dup containment (inverted
  * index on frame hash), and the batch retrieval eval over a Zipf corpus
  * of the same doc count. Prints one JSON line.
  */
object MediaScaleSmoke {
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

    // the fixture synthesis contract at n ids (real PNG/WAV/GIF payloads)
    val media = Multimodal.withRealMedia(
      spark.range(n.toLong).select(col("id").as("doc_id"),
        lit("x").as("text"), lit("s").as("source")))
      .localCheckpoint()

    val images = media.filter(col("modality") === "image")
    val videos = media.filter(col("modality") === "video")

    val (ahCnt, ahSec) = timed(Multimodal.decodeImageAHash(images).count())
    val ah = Multimodal.decodeImageAHash(images)
      .select(col("media_id").as("doc_id"), col("ahash").as("simhash"))
      .localCheckpoint() // pairs phase times the JOIN, not a re-decode
    val (pairCnt, pairSec) = timed(Dedup.simhashPairs60(ah, 2).count())
    // pigeonhole band-bucket sizes: 3 bands × 20-bit chunks of the hash —
    // the join's work is Σ bucket² per band, so max/mean tell the story
    val bandBuckets = (0 until 3).map { b =>
      ah.groupBy((col("simhash").bitwiseAND(lit(0xFFFFFL) * lit(1L << (20 * b)))
        ).as("chunk")).count()
    }.reduce(_ unionAll _).agg(max("count"), avg("count")).head()
    val (fhCnt, fhSec) = timed(Multimodal.decodeVideoFrameHashes(videos).count())
    val fh = Multimodal.decodeVideoFrameHashes(videos).localCheckpoint()
    val (ndCnt, ndSec) = timed(Multimodal.videoNearDup(fh).count())
    // inverted-index bucket sizes: frame-hash collision groups
    val fhBuckets = fh.select("media_id", "ahash").distinct()
      .groupBy("ahash").count().agg(max("count"), avg("count"), count(lit(1))).head()

    val docs = ZipfCorpus.synth(
      spark.range(n.toLong).select(col("id").as("doc_id"))).localCheckpoint()
    val (evCnt, evSec) = timed(Search.evalMetrics(docs, 20, 10).count())

    println(f"""{"n_media":$n,"ahash_rows":$ahCnt,"ahash_sec":$ahSec%.1f,"ahash_pairs":$pairCnt,"ahash_pairs_sec":$pairSec%.1f,"band_bucket_max":${bandBuckets.getLong(0)},"band_bucket_mean":${bandBuckets.getDouble(1)}%.1f,"framehash_rows":$fhCnt,"framehash_sec":$fhSec%.1f,"neardup_pairs":$ndCnt,"neardup_sec":$ndSec%.1f,"fh_bucket_max":${fhBuckets.getLong(0)},"fh_bucket_mean":${fhBuckets.getDouble(1)}%.2f,"fh_buckets":${fhBuckets.getLong(2)},"search_eval_rows":$evCnt,"search_eval_sec":$evSec%.1f}""")
    spark.stop()
  }
}
