package graft

import graft.operators.{Bpe, ByteFallback, Curation, TextAnalysis, Ulm}
import graft.sources.ZipfCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 decade probe — `sbt "runMain graft.R18Probe 5000"` vs 50000
  * vs 500000; one JSON line per run for the BASELINE.md table. Three
  * measurements the round's operators claim scale on:
  *
  * 1. BYTE-FALLBACK ENCODE on a FOREIGN-HEAVY corpus (every doc carries
  *    two OOV tokens, incl. a non-BMP one): the fallback multiplies
  *    token rows (each OOV char → its UTF-8 bytes), so the probe
  *    reports the id-stream expansion (Σ ids vs Σ words) and the encode
  *    wall. The model is trained ONCE on a fixed 5k slice (the
  *    train-once/encode-forever contract) — only the encode scales
  *    with n.
  * 2. SOFT-EM vs HARD-EM trainer round cost: the lattice is
  *    O(len·maxPieceLen) per word TYPE, so both trainers must scale
  *    with the Heaps-bounded type count, not the corpus; the probe
  *    reports nTypes alongside both walls.
  * 3. SHARD MANIFEST at 10× token budgets (500/5k/50k per sequence,
  *    fixed corpus): manifest rows shrink ~10× per step; the wall must
  *    stay ~flat (the layout is integer arithmetic over the prefix-sum
  *    pack, no per-budget blowup).
  */
object R18Probe {
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

    val P = Ulm.Params() // production: no oracle-unroll assert
    val toks = ByteFallback.Tokens

    // foreign-heavy corpus: every doc gets two OOV tokens (one astral)
    val base = ZipfCorpus.synth(spark.range(n.toLong).select(col("id").as("doc_id")))
      .select("doc_id", "text")
    val t1 = toks.zipWithIndex.foldLeft(lit(" "): org.apache.spark.sql.Column) {
      case (acc, (t, i)) => when(col("doc_id") % toks.size === i, lit(" " + t)).otherwise(acc)
    }
    val docsF = base.select(col("doc_id"),
      concat(col("text"), t1, lit(" "), lit(toks.last)).as("text")).localCheckpoint()

    // fixed model from a constant 5k ascii slice (train-once contract)
    val train5k = ZipfCorpus.synth(spark.range(5000L).select(col("id").as("doc_id")))
      .select("doc_id", "text").localCheckpoint()
    val seg = Ulm.train(train5k, P)._2.localCheckpoint()
    val pids = Ulm.pieceIds(seg).localCheckpoint()
    val wtTrain = Bpe.wordTypes(train5k).drop("sym")
    val cnt = Ulm.pathCounts(seg, Ulm.seed(wtTrain, P.maxPieceLen, P.seedSize))
    val costs = Ulm.costMap(
      cnt.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)

    // 1. byte-fallback encode growth
    val wtF = ByteFallback.wordTypes(docsF).localCheckpoint()
    val (nTypesF, typesSec) = timed(wtF.count())
    val wids = Ulm.wordIdsFromFixedBytes(wtF.drop("sym"), costs, P.maxPieceLen, pids)
      .localCheckpoint()
    val (encAgg, encSec) = timed(
      ByteFallback.encodeFrom(docsF, wids, "n_pieces", "n_ulm_tokens")
        .agg(sum(col("n_ulm_tokens")).as("ids"), count(lit(1)).as("docs"))
        .collect()(0))
    val nIds = encAgg.getLong(0)
    val (nWords, _) = timed(ByteFallback.tokens(docsF).count())

    // 2. soft vs hard trainer round cost on the same corpus
    val (_, hardSec) = timed(Ulm.train(docsF, P)._2.count())
    val (_, softSec) = timed(Ulm.softTrain(docsF, P)._1.count())

    // 3. shard manifest at 10x budgets over a fixed counts table
    val counts = TextAnalysis.tokenCounts(docsF)
      .select(col("doc_id"), col("alnum_tokens").as("n_tok")).localCheckpoint()
    counts.count()
    val shardWalls = Seq(500L, 5000L, 50000L).map { c =>
      val (rows, sec) = timed(Curation.shardManifestFrom(counts, c, 8L).count())
      (c, rows, sec)
    }
    val sh = shardWalls.map { case (c, r, s) => f""""b$c":{"rows":$r,"sec":$s%.2f}""" }
      .mkString(",")

    println(f"""{"n":$n,"n_types_foreign":$nTypesF,"types_sec":$typesSec%.2f,""" +
      f""""words":$nWords,"ids":$nIds,"expansion":${nIds.toDouble / nWords}%.4f,""" +
      f""""encode_sec":$encSec%.2f,"hard_train_sec":$hardSec%.2f,""" +
      f""""soft_train_sec":$softSec%.2f,$sh}""")
    spark.stop()
  }
}
