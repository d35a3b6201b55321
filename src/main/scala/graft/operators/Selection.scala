package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Data selection via importance resampling (DSIR-style): score every raw
  * document by how much it resembles a target domain, using hashed n-gram
  * bag-of-words models — the standard cheap data-selection signal an LLM
  * pipeline runs over the whole crawl before training.
  *
  * Model: unigram+bigram occurrences hash into `Buckets` feature buckets;
  * a target distribution p (docs matching the target predicate) and a raw
  * distribution q (the full pool) are estimated with add-one smoothing over
  * the bucket space; a document's importance weight is
  * `log w(d) = Σ_b count_d[b] · (ln p[b] − ln q[b])`.
  *
  * Cross-engine gate: the per-bucket log-ratio is collapsed ONCE to an
  * integer micro-nat (`lam_micro = round_6(ln ratio)·1e6` as BIGINT,
  * bucket-cardinality-bounded work), after which the per-document score is
  * PURE INTEGER arithmetic — `Σ count·lam_micro` is an exact, order-free
  * BIGINT sum in both engines, divided once at the end for display. No
  * floating-point aggregation anywhere corpus-scale.
  *
  * Scale shape: one gram-stream scan feeds both the model (hash agg on a
  * `Buckets`-sized key — partials collapse map-side, the shuffle is B rows
  * per partition) and the per-doc features (hash agg on (doc_id, bucket));
  * the λ table is B rows and broadcast, so scoring adds no corpus-scale
  * shuffle beyond the one (doc_id, bucket) aggregate. Selection is a
  * TakeOrderedAndProject top-k, never a global sort.
  */
object Selection {

  /** Feature-space size. Small enough that the λ table broadcast is trivial
    * and the model shuffle is negligible; large enough that bucket
    * collisions blur, not bury, the domain signal (DSIR uses 10k buckets at
    * crawl scale — the ratio estimator is collision-tolerant by design).
    */
  val Buckets = 512

  /** Unigram + bigram occurrence stream: (keep..., g), one row per gram.
    * Both gram orders are built from the SAME token array and exploded in
    * ONE pass (unigram array ++ bigram array), so the stream costs a single
    * narrow corpus scan — a union of two explode branches would scan twice.
    */
  def gramStream(docs: DataFrame, keep: Seq[String] = Seq("doc_id")): DataFrame = {
    val arr = TextOps.splitWords(TextOps.normalize(col("text")))
    val base = docs.select(keep.map(col) :+ arr.as("arr"): _*)
    // zip_with over two slices, NOT transform(sequence(...), element_at):
    // the indexed-lambda form runs interpreted and re-enters element_at per
    // index — measured 17× slower at sf0.1 for identical rows
    // (Search.phraseTopK carries the original measurement).
    val n = size(col("arr"))
    val bigram = zip_with(
      slice(col("arr"), lit(1), n - 1),
      slice(col("arr"), lit(2), n - 1),
      (a, b) => concat_ws(" ", a, b))
    // guard: slice length n-1 is negative on an empty array
    val grams = concat(col("arr"),
      when(n >= 2, bigram).otherwise(array()))
    base.select(keep.map(col) :+ explode(grams).as("g"): _*)
  }

  /** Feature bucket of a gram: the same md5 60-bit slice every other gated
    * hash in the repo uses (Dedup.shingleKey), reduced mod `buckets` —
    * non-negative, so `%` agrees between engines.
    */
  def bucket(g: Column, buckets: Int = Buckets): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long") % buckets

  /** λ projection over a (b, cr, ct) bucket-count table.
    * (ct+1)(Tr+B) and (cr+1)(Tt+B) are exact BIGINT products (< 2^53),
    * each converted to double exactly; ONE double division + ln, then the
    * stab collapse to integer micro-nats. Identical op sequence in DuckDB.
    */
  private def lambdaFrom(counts: DataFrame, buckets: Int): DataFrame = {
    val tot = counts.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    counts.crossJoin(broadcast(tot))
      .select(col("b"),
        floor(log(((col("ct") + 1).cast("double") * (col("tr") + buckets)) /
          ((col("cr") + 1) * (col("tt") + buckets)).cast("double")) *
          lit(1000000.0) + lit(0.5)).cast("long").as("lam_micro"))
  }

  /** Integer-exact per-doc scoring tail over (doc_id, b, c) features. */
  private def scoreCells(cells: DataFrame, lam: DataFrame): DataFrame =
    cells
      .join(broadcast(lam), "b")
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"), sum(col("c") * col("lam_micro")).as("lw_micro"))
      .select(col("doc_id"), col("n_grams"),
        (col("lw_micro").cast("double") / lit(1000000.0)).as("logw"))

  /** Train the model: (b, lam_micro) — the per-bucket importance log-ratio
    * `round_6(ln((ct+1)(Tr+B) / ((cr+1)(Tt+B))))·1e6` as BIGINT. Buckets
    * never seen in the raw pool carry no row; they cannot occur in any
    * document to score (raw = the full pool), so the λ table is total over
    * the join domain by construction.
    */
  def model(docs: DataFrame, isTarget: Column, buckets: Int = Buckets): DataFrame = {
    val g = gramStream(docs.withColumn("is_t", isTarget), Seq("is_t"))
      .select(col("is_t"), bucket(col("g"), buckets).as("b"))
    val counts = g.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
      // <= `buckets` rows, referenced twice below (totals + λ projection);
      // without the cut each reference re-runs the corpus gram scan
      .localCheckpoint()
    lambdaFrom(counts, buckets)
  }

  /** Per-document importance weights: (doc_id, n_grams, logw). The score
    * aggregate is exact integer arithmetic (see object doc); `logw` is the
    * single final micro-nat→double conversion.
    *
    * ONE corpus gram scan: the (doc_id, is_t, b) → c cell aggregate is
    * materialized once (localCheckpoint — it is feature-table-sized,
    * ≤ docs×buckets rows, vs the gram stream's corpus scale) and feeds
    * BOTH the λ model (re-aggregated to bucket level — exact same integer
    * counts as training directly off the stream) and the per-doc features.
    * Training twice off the raw stream would double the dominant cost of
    * the whole operator at crawl scale.
    */
  def weights(docs: DataFrame, isTarget: Column, buckets: Int = Buckets): DataFrame = {
    val cells = gramStream(docs.withColumn("is_t", isTarget), Seq("doc_id", "is_t"))
      .select(col("doc_id"), col("is_t"), bucket(col("g"), buckets).as("b"))
      .groupBy("doc_id", "is_t", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val bucketCounts = cells.groupBy("b").agg(
      sum("c").as("cr"),
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct"))
    scoreCells(cells.select("doc_id", "b", "c"), lambdaFrom(bucketCounts, buckets))
  }

  /** Score against a pre-trained λ table — a pipeline trains the model once
    * (or on a held-out target) and scores many raw corpora with it.
    */
  def weightsFrom(docs: DataFrame, lam: DataFrame, buckets: Int = Buckets): DataFrame =
    scoreCells(
      gramStream(docs).select(col("doc_id"), bucket(col("g"), buckets).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("c")),
      lam)

  /** The selection itself: top-k raw documents by importance weight
    * (deterministic ties → lower doc_id), ranked. TakeOrderedAndProject
    * does the top-k; the rank window runs over k rows, not the corpus.
    */
  def selectTopK(docs: DataFrame, isTarget: Column, k: Int,
                 buckets: Int = Buckets): DataFrame = {
    val w = weights(docs, isTarget, buckets)
      .orderBy(desc("logw"), asc("doc_id")).limit(k)
    w.withColumn("rank",
        row_number().over(Window.orderBy(desc("logw"), asc("doc_id"))).cast("long"))
      .select("rank", "doc_id", "n_grams", "logw")
  }

  /** Contrastive training-pair mining over a verified candidate-pair
    * table `pairs(doc_a, doc_b, jaccard)` (an LSH pair generator run with
    * threshold 0): positives are pairs at or above `posT`; HARD negatives
    * are same-bucket pairs in [negLo, negHi] — lexically overlapping but
    * non-duplicate, exactly the negatives an embedding model learns most
    * from — capped at the `kNeg` highest-Jaccard per anchor. The
    * (posT, negHi) gray zone is dropped (ambiguous supervision, the
    * standard contrastive hygiene).
    *
    * Scale shape: candidates are LSH-banding-bounded per anchor, so the
    * per-(doc_a,label) rank window has bounded partitions — never a
    * corpus-wide key. Everything upstream is the already-locked banded
    * equi-join machinery; this stage adds one projection + one bounded
    * window. Ties in jaccard break by doc_b, so the kept negative set is
    * deterministic in both engines.
    */
  def contrastivePairs(pairs: DataFrame, posT: Double = 0.8,
                       negLo: Double = 0.05, negHi: Double = 0.5,
                       kNeg: Int = 5): DataFrame = {
    val labeled = pairs
      .withColumn("label",
        when(col("jaccard") >= posT, lit("pos"))
          .when(col("jaccard") >= negLo && col("jaccard") <= negHi, lit("neg")))
      .filter(col("label").isNotNull)
    val w = Window.partitionBy("doc_a", "label")
      .orderBy(desc("jaccard"), asc("doc_b"))
    labeled.withColumn("rnk", row_number().over(w))
      .filter(col("label") === "pos" || col("rnk") <= kNeg)
      .select("doc_a", "doc_b", "jaccard", "label")
  }
}
