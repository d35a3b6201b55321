package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The end-to-end curation decision — the single operation a training-data
  * pipeline actually ships: one declarative plan that composes every keep
  * signal this library computes into the final training-corpus keep list.
  *
  * A document survives iff ALL of:
  *   - it is in the training split (doc_id >= evalMax; below is the held
  *     eval set everything is decontaminated against),
  *   - the C4-style clean gates pass (length floor, quality floor,
  *     language gate — TextAnalysis.cleanCorpus, one hash aggregate),
  *   - its repeated-3-gram ratio is at most maxRep (boilerplate gate),
  *   - its bigram-LM mean NLL is at most maxNll (gibberish gate, scored
  *     against a pre-trained model so curation never re-trains),
  *   - it shares at most maxContam distinct 3-shingles with the eval set
  *     (a COUNT threshold, not any-overlap: chance shingle collisions are
  *     ubiquitous — the median train doc here shares 1-2 — while verbatim
  *     leaks share tens; production pipelines use long n-grams for the
  *     same reason),
  *   - it is its near-dup cluster's representative (min-doc_id member) or
  *     clusters with nobody.
  *
  * Scale shape: every signal is a narrow explode + one doc_id-keyed hash
  * aggregate over the corpus (partial aggs map-side), the eval shingle set
  * is eval-sized and broadcast, the near-dup graph rides the banded-LSH
  * pair generator — nothing here is quadratic in the corpus, and the final
  * decision is doc_id-keyed joins of aggregate-sized tables. At 100 TB a
  * pipeline would persist each signal column once and re-join; the plan
  * below IS that dataflow, just unmaterialized.
  */
object Curation {

  /** @param docs   the documents table
    * @param sh     (doc_id, shingle) — the shared persisted shingle table
    * @param lm     pre-trained bigram LM (TextAnalysis.bigramLm layout)
    * @param pairs  verified near-dup pairs (doc_a, doc_b, jaccard)
    */
  def curate(docs: DataFrame, sh: DataFrame, lm: DataFrame, pairs: DataFrame,
             evalMax: Long = 10, maxRep: Double = 0.05, maxNll: Double = 3.45,
             maxContam: Long = 4): DataFrame = {
    val clean = TextAnalysis.cleanCorpus(docs)
    val rep = TextAnalysis.repetition(docs).select(col("doc_id"), col("rep_ratio"))
    val nll = TextAnalysis
      .bigramNllFrom(TextAnalysis.bigramStream(docs), lm)
      .select(col("doc_id"), col("avg_nll"))
    val bench = sh.filter(col("doc_id") < evalMax).select("shingle").distinct()
    val contam = sh.filter(col("doc_id") >= evalMax)
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
      .filter(col("n_contaminated") > maxContam)
      .select("doc_id")
    val dupDrop = Dedup.clusters(pairs)
      .filter(col("doc_id") =!= col("keep_id")).select("doc_id")
    clean.filter(col("doc_id") >= evalMax)
      .join(rep, "doc_id").join(nll, "doc_id")
      .filter(col("rep_ratio") <= maxRep && col("avg_nll") <= maxNll)
      .join(contam, Seq("doc_id"), "left_anti")
      .join(dupDrop, Seq("doc_id"), "left_anti")
      .select("doc_id", "n_tokens", "quality", "rep_ratio", "avg_nll")
  }

  /** Weighted source mixing — the data-mixing step every training run
    * does after curation: draw a deterministic per-source quota from the
    * corpus so the output hits target proportions. Selection is by
    * content-hash order within each source (the same reproducible-shuffle
    * discipline as text_sample_hash: identical survivors on any cluster,
    * any run), so re-weighting a 100 TB corpus is one partitioned window
    * over source — no global sort, no rand(). Over-asked quotas
    * truncate at the source's size (a short source simply contributes
    * everything it has). Returns (doc_id, source, rk) — rk the doc's
    * 1-based position in its source's hash order.
    */
  def mixBySource(docs: DataFrame, weights: Map[String, Double],
                  total: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // floor with an epsilon: plain floor(w·total) under-counts when the
    // product lands one ulp below its decimal value (0.29 × 100 =
    // 28.999999999999996 → 28, not the intended 29); the epsilon is far
    // above double noise and far below any honest fractional quota
    val quotas = weights.toSeq
      .map { case (s, w) => (s, math.floor(w * total + 1e-9).toLong) }
      .toDF("source", "quota")
    docs.join(broadcast(quotas), "source")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
      .filter(col("rk") <= col("quota"))
      .select("doc_id", "source", "rk")
  }

  /** Token-budget sequence packing (concat-and-chunk, the GPT-style
    * pre-training layout): documents are laid out in content-hash order
    * and cut into fixed-budget chunks; a doc belongs to the chunk its
    * first token lands in. The global exclusive prefix-sum over token
    * counts is DISTRIBUTED, not a single-partition window: docs bucket
    * by their hash's first hex char (16 ordered buckets that sort-align
    * with the global hash order — the vocabulary-id trick), each bucket
    * prefix-sums in parallel, and bucket offsets come from a running-sum
    * window over the 16-row aggregate, broadcast back. Token counts are
    * the BPE-ish alnum proxy (TextAnalysis.tokenCounts). Returns one row
    * per chunk: (seq_id, n_docs, n_tokens).
    */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val t = TextAnalysis.tokenCounts(docs)
      .select(col("doc_id"), col("alnum_tokens").as("n_tok"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("pfx", substring(col("h"), 1, 1))
    val offsets = t.groupBy("pfx").agg(sum("n_tok").as("n"))
      .withColumn("off", coalesce(
        sum("n").over(w.orderBy("pfx")
          .rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
      .select("pfx", "off") // ≤16 rows — the only single-partition window
    t.join(broadcast(offsets), "pfx")
      .withColumn("start", col("off") + coalesce(
        sum("n_tok").over(w.partitionBy("pfx").orderBy("h", "doc_id")
          .rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_id", expr(s"start div ${budget}L")) // long integral div — exact at any magnitude
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
  }
}
