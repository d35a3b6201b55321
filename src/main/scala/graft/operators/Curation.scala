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
}
