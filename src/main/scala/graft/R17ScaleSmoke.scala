package graft

import graft.operators.{Bpe, Curation, Multimodal, Ulm}
import graft.sources.ZipfCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot decade measurement for the round-16/17 operators that had
  * scale CLAIMS but no measured growth law yet (round-16 verdict #3):
  * `sbt "runMain graft.R17ScaleSmoke 5000"` vs `... 50000`.
  *
  * Phases and why each should be ~linear in n:
  *  - ulm_prune: the full prune trainer on a Zipf corpus — the
  *    leave-one-out pass is |word types| × used-multi-pieces DPs, and
  *    TYPES grow sublinearly with docs (Heaps' law on the Zipf fixture),
  *    so loo_pairs is the printed witness, never |docs|-scale;
  *  - prune_deep: pruneSchedule round counts for production-shaped
  *    vocabularies (32k→8k etc.) — pure driver arithmetic, printed so
  *    the ~log_{1/(1−eta)} round-count claim is a number, not an argument;
  *  - pack_skew: best-fit packing over a DOMINANT-single-class corpus
  *    (the regime observation #3 parameterized the rank buckets for) —
  *    per-doc rank work is bucket-local, so the phase must scale ~n;
  *  - jpeg: marker walk + the two-bound error card over the 3-variant
  *    fixture — per-payload row-local decode;
  *  - mp4/webm tracks: per-payload container walks.
  * Prints ONE JSON line (the BASELINE.md decade-table contract).
  */
object R17ScaleSmoke {
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
    import spark.implicits._

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // --- ulm prune on a Zipf corpus of n docs (seed 128 -> 32 multi) ---
    val docs = ZipfCorpus.synth(spark.range(n.toLong).select(col("id").as("doc_id")))
      .localCheckpoint()
    val p = Ulm.Params()
    val pp = Ulm.PruneParams(targetMulti = 32, eta = 0.5)
    val (pruneRes, pruneSec) = timed {
      val r = Ulm.pruneTrain(docs, p, pp)
      r.card.count() // materialize the full prune inside the timed block
      r
    }
    val pruneRounds = pruneRes.curve.select("round").distinct().count()
    // the leave-one-out workload witness: (word type, used multi piece)
    // DP pairs under the FINAL costs — the quantity that must track
    // TYPES (sublinear), not docs
    val wt = Bpe.wordTypes(docs).drop("sym").localCheckpoint()
    val nTypes = wt.count()
    val seg = Ulm.segment(wt, pruneRes.finalCosts, p.maxPieceLen)
    val looPairs = seg
      .select(explode(split(col("pieces"), " ")).as("piece"))
      .filter(length(col("piece")) >= 2).count()

    // --- production-shaped prune schedules (driver arithmetic) ---
    val sched32k = Ulm.pruneSchedule(32768, Ulm.PruneParams(targetMulti = 8192, eta = 0.25))
    val sched8k = Ulm.pruneSchedule(8192, Ulm.PruneParams(targetMulti = 1024, eta = 0.25))

    // --- best-fit packing, dominant-single-class skew corpus ---
    val skew = spark.range(n.toLong).select(col("id").as("doc_id"),
      when(col("id") % 20 === 0, (col("id") % 499) + 1).otherwise(lit(137L))
        .cast("long").as("n_tok"))
      .localCheckpoint()
    val (packCnt, packSec) = timed(
      Curation.packBestFitAssignments(skew, 500L).count())

    // --- media walks at n/5 payloads each (the fixture populations) ---
    val ids = spark.range(n.toLong / 5)
      .select((col("id") * 3).as("doc_id"), lit("x").as("text"), lit("s").as("source"))
    val jm = Multimodal.withJpegMedia(ids).localCheckpoint()
    val (jpegCnt, jpegSec) = timed(Multimodal.decodeJpegMarkers(jm).count())
    val (jerrCnt, jerrSec) = timed(Multimodal.decodeJpegError(
      jm.filter(expr("media_id div 3") % 2 === 1)).count())
    // video fixtures keep doc_id % 3 == 2 — align the ids so the phase
    // really walks n/5 payloads (review finding: raw ids gave n/15)
    val vids = spark.range(n.toLong / 5)
      .select((col("id") * 3 + 2).as("doc_id"), lit("x").as("text"), lit("s").as("source"))
    val mp4 = Multimodal.withMp4Media(vids).localCheckpoint()
    val (mp4Cnt, mp4Sec) = timed(Multimodal.decodeMp4Tracks(mp4).count())
    val webm = Multimodal.withWebmMedia(vids).localCheckpoint()
    val (webmCnt, webmSec) = timed(Multimodal.decodeWebmTracks(webm).count())

    println(
      f"""{"n":$n,"prune_sec":$pruneSec%.2f,"prune_rounds":$pruneRounds,"n_types":$nTypes,"loo_pairs":$looPairs,"sched_32k_to_8k_rounds":${sched32k.size},"sched_8k_to_1k_rounds":${sched8k.size},"pack_skew_docs":$packCnt,"pack_skew_sec":$packSec%.2f,"jpeg_meta_n":$jpegCnt,"jpeg_meta_sec":$jpegSec%.2f,"jpeg_err_n":$jerrCnt,"jpeg_err_sec":$jerrSec%.2f,"mp4_tracks":$mp4Cnt,"mp4_sec":$mp4Sec%.2f,"webm_tracks":$webmCnt,"webm_sec":$webmSec%.2f}""")
    spark.stop()
  }
}
