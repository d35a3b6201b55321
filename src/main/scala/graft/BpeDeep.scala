package graft

import graft.operators.Bpe
import graft.sources.ZipfCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Production-depth BPE training run (round-10 verdict #3): the batched
  * trainer's "~numMerges/batch rounds" claim was only ever measured at 64
  * merges — this main runs it to a realistic vocabulary depth on the
  * Zipf corpus and reports the realized round count, per-round fill
  * distribution, and wall-clock growth curve, so BASELINE.md carries
  * measured (not extrapolated) numbers.
  *
  * `sbt "runMain graft.BpeDeep [nDocs] [numMerges] [batch]"` — defaults
  * 50000 / 4096 / 64. Prints one JSON line: total wall-clock, rounds,
  * fill histogram (how many rounds picked k merges), and a sampled
  * (merges_done, elapsed_sec) curve every ~16 rounds.
  */
object BpeDeep {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50000)
    val numMerges = args.lift(1).map(_.toInt).getOrElse(4096)
    val batch = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = ZipfCorpus.synth(spark.range(n.toLong).select(col("id").as("doc_id")))
      .localCheckpoint()

    val t0 = System.nanoTime()
    val fills = Seq.newBuilder[Int]
    val curve = Seq.newBuilder[(Int, Double)]
    var done = 0
    val merges = Bpe.trainBatched(docs, numMerges, batch, onRound = { (round, picks) =>
      done += picks
      fills += picks
      if (round % 16 == 0 || done >= numMerges)
        curve += ((done, (System.nanoTime() - t0) / 1e9))
      if (round % 16 == 0)
        System.err.println(f"[bpedeep] round $round: $done/$numMerges merges, ${(System.nanoTime() - t0) / 1e9}%.0f s")
    })
    val trainSec = (System.nanoTime() - t0) / 1e9

    // the trained tokenizer's realized vocabulary (distinct symbols) and
    // a corpus-budget encode at full depth — the artifact a pipeline ships
    val (vocabSize, encSec) = {
      val e0 = System.nanoTime()
      val v = Bpe.symbolVocab(Bpe.wordTypes(docs), merges).count()
      (v, (System.nanoTime() - e0) / 1e9)
    }

    val fl = fills.result()
    val hist = fl.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${v.size}""" }.mkString("{", ",", "}")
    val curveJson = curve.result()
      .map { case (m, s) => f"[$m,$s%.1f]" }.mkString("[", ",", "]")
    println(f"""{"n_docs":$n,"num_merges":${merges.size},"batch":$batch,"rounds":${fl.size},"train_sec":$trainSec%.1f,"mean_fill":${if (fl.isEmpty) 0.0 else fl.sum.toDouble / fl.size}%.1f,"fill_hist":$hist,"vocab_symbols":$vocabSize,"vocab_encode_sec":$encSec%.1f,"curve":$curveJson}""")
    spark.stop()
  }
}
