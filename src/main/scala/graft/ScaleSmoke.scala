package graft

import graft.operators.{Bpe, Curation, Selection}
import graft.sources.ZipfCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot scale measurement for DSIR selection and BPE training on the
  * Zipf corpus at an arbitrary doc count — the dedup tiers got this
  * treatment in round 8 (ZipfCrossover, BASELINE.md's candidate-growth
  * table); this main gives the two remaining iterative/corpus-scan
  * operator families the same measured-not-argued linearity evidence:
  * `sbt "runMain graft.ScaleSmoke 5000"` vs `... 50000` — a 10× doc
  * growth should move every phase ~10× (linear), never ~100×.
  *
  * Phases timed separately: DSIR weights (one gram scan + bucket aggs),
  * DSIR top-k select, BPE 64-merge training (64 argmax rounds over the
  * word-type table — crosses one ChunkMerges checkpoint boundary), BPE
  * per-doc encode. Prints one JSON line.
  */
object ScaleSmoke {
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

    val docs = ZipfCorpus.synth(spark.range(n.toLong).select(col("id").as("doc_id")))
      .localCheckpoint()

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val isTarget = col("doc_id") % 10 === 0 // a 10% "target domain"
    val (wCnt, wSec) = timed(Selection.weights(docs, isTarget).count())
    val (selCnt, selSec) = timed(Selection.selectTopK(docs, isTarget, 1000).count())

    val (merges, trainSec) = timed(Bpe.train(docs, 64))
    val (bm, batchedSec) = timed(Bpe.trainBatched(docs, 64, 64))
    val (tokCnt, encSec) = timed(Bpe.docTokenCounts(docs, merges).count())
    val nTypes = Bpe.wordTypes(docs).count()

    // Mixing / packing / shuffle (round-10 verdict #7): the 16-bucket
    // window decompositions are value-identical-gated at the SF tiers;
    // this measures their GROWTH. Sources are deliberately skewed — src0
    // holds half the corpus, the exact case the decomposition exists for
    // (a plain source-partitioned window would serialize src0 through
    // one task). Token quota targets ~40% of the ~40·n corpus tokens so
    // the mix does real cumulative-sum work at every n.
    val srcDocs = docs.withColumn("source",
      when(col("doc_id") % 2 === 0, "src0")
        .when(col("doc_id") % 4 === 1, "src1").otherwise("src2"))
    val (mixCnt, mixSec) = timed(Curation.mixByTokens(srcDocs,
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 16L * n).count())
    val (packCnt, packSec) = timed(Curation.packSequences(docs, 500L).count())
    val (shufCnt, shufSec) = timed(Curation.epochShuffle(docs, 2).count())

    // Round-11 additions: the span-level dedup pass, the RAG chunker, and
    // the incremental batch-vs-corpus LSH — same decade treatment. The
    // incremental phase materializes signatures/keys once (the persisted-
    // artifact posture of the registered query) and times only the probe.
    val (spanCnt, spanSec) = timed(
      graft.operators.TextAnalysis.duplicateSpans(docs, 8).count())
    val (chunkCnt, chunkSec) = timed(
      graft.operators.TextAnalysis.chunks(docs, 64, 48).count())
    val sh = graft.operators.Dedup.shingles(docs, 3)
    val sig = graft.operators.Dedup.minhashSignatures(sh, 12).localCheckpoint()
    val shk = sh.select(col("doc_id"),
      graft.operators.Dedup.shingleKey(col("shingle")).as("shk")).localCheckpoint()
    val isNew = col("doc_id") % 10 === 0
    val (incCnt, incSec) = timed(
      graft.operators.Dedup.minhashLshPairsIncremental(
        sig.filter(isNew), sig.filter(!isNew),
        shk.filter(isNew), shk.filter(!isNew), 6, 2, 0.6).count())

    // Bloom novelty + Misra–Gries heavy hitters (this session's ops):
    // novelty probes a batch of n/10 re-synthesized docs (all re-fetches
    // → worst case: every row is bloom-positive and exact-verifies);
    // heavy hitters runs both passes over the full token stream.
    val batch = ZipfCorpus.synth(
      spark.range(n.toLong).filter(col("id") % 10 === 0)
        .select(col("id").as("doc_id")))
    val (novCnt, novSec) = timed(
      graft.operators.Dedup.bloomNovelDocs(batch, docs).count())
    val (hhCnt, hhSec) = timed(
      graft.operators.Sketch.heavyHitters(docs, 0.02, 128).count())

    // Round-12 rule battery + winnowing, same decade treatment: the
    // Gopher gates and entropy are per-doc aggregates (linear by
    // construction — measured to prove it); winnowing is the doc-windowed
    // sliding min; the copy-detection join is Σ bucket² over fingerprint
    // collision groups, the phase that WOULD go quadratic if the sketch
    // lost its selectivity.
    val (gqCnt, gqSec) = timed(
      graft.operators.QualityRules.gopherQuality(docs).count())
    val (grCnt, grSec) = timed(
      graft.operators.QualityRules.gopherRepetition(docs).count())
    val (entCnt, entSec) = timed(
      graft.operators.QualityRules.wordEntropy(docs).count())
    // PREFIX form here: zipf's head trigrams put one fingerprint in a
    // 13 000-doc bucket at 50k docs, where the plain inverted-index join
    // goes Σ bucket² (measured 50.1 s vs 3.0 s prefix, BASELINE.md) —
    // the registered production path on collision-heavy corpora.
    val fp = graft.operators.TextAnalysis.winnowing(docs)
      .withColumnRenamed("fp", "shk")
    val (fpCnt, fpSec) = timed(fp.count())
    val fpc = fp.localCheckpoint()
    val (wpCnt, wpSec) = timed(
      graft.operators.Dedup.containmentPairsPrefixFromKeys(fpc, 0.3).count())

    println(f"""{"n_docs":$n,"gopher_quality_rows":$gqCnt,"gopher_quality_sec":$gqSec%.1f,"gopher_rep_rows":$grCnt,"gopher_rep_sec":$grSec%.1f,"entropy_rows":$entCnt,"entropy_sec":$entSec%.1f,"winnow_fp_rows":$fpCnt,"winnow_fp_sec":$fpSec%.1f,"winnow_pairs":$wpCnt,"winnow_pairs_sec":$wpSec%.1f,"dsir_weights_rows":$wCnt,"dsir_weights_sec":$wSec%.1f,"dsir_select_rows":$selCnt,"dsir_select_sec":$selSec%.1f,"bpe_merges":${merges.size},"bpe_train_sec":$trainSec%.1f,"bpe_train_batched_merges":${bm.size},"bpe_train_batched_sec":$batchedSec%.1f,"bpe_word_types":$nTypes,"bpe_encode_rows":$tokCnt,"bpe_encode_sec":$encSec%.1f,"mix_tokens_rows":$mixCnt,"mix_tokens_sec":$mixSec%.1f,"pack_rows":$packCnt,"pack_sec":$packSec%.1f,"shuffle_rows":$shufCnt,"shuffle_sec":$shufSec%.1f,"dup_spans_rows":$spanCnt,"dup_spans_sec":$spanSec%.1f,"chunk_rows":$chunkCnt,"chunk_sec":$chunkSec%.1f,"incremental_pairs":$incCnt,"incremental_sec":$incSec%.1f,"bloom_novel_rows":$novCnt,"bloom_novel_sec":$novSec%.1f,"heavy_hitters_rows":$hhCnt,"heavy_hitters_sec":$hhSec%.1f}""")
    spark.stop()
  }
}
