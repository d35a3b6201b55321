package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Published rule-based quality filters for LLM training corpora — the
  * heuristic battery every large-scale pipeline runs before any model-based
  * scoring, re-expressed as row-local Catalyst plans:
  *
  *  - Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
  *    Methods, Analysis & Insights from Training Gopher", appendix A1.1):
  *    word-count bounds, mean-word-length band, alphabetic-word fraction,
  *    required-stopword count.
  *  - Gopher repetition rules (same appendix): fraction of the doc covered
  *    by its most frequent word / 2-gram.
  *  - Out-of-vocabulary rate per source against the corpus's own top-k
  *    vocabulary — the coverage number a tokenizer/data card reports.
  *  - Group-consistent train/val split: hash the SOURCE, not the doc, so
  *    near-duplicates within a domain can never straddle the split (the
  *    leakage mode a per-doc hash split invites).
  *
  * All tokenization here is the repo's standard whitespace rule (the
  * `tokCte` contract: lower → split on \s+ → drop empty and all-digit
  * tokens), so every output is DuckDB-oracle-gated exactly.
  *
  * Scale shape: the quality/repetition signals are per-doc aggregates of
  * exploded tokens (hash aggregation with map-side partials — no windows,
  * no collects); OOV is two hash aggregates plus one broadcast semi-join
  * of a k-row vocabulary; the split is a row-local projection. Nothing
  * here holds more than (k + |sources|) rows outside a shuffle.
  */
object QualityRules {

  /** The Gopher required-stopword list (Rae et al. 2021, A1.1). Occurrence
    * counts, not distinct membership — a doc with "the ... the" passes the
    * ≥ 2 bar, matching the commonly deployed reading of the rule.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def tok(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(TextOps.splitWords(lower(col("text")))).as("word"))
      .filter(TextOps.isKeptToken(col("word")))

  /** Per-doc Gopher quality signals + the keep decision:
    * 50 ≤ n_words ≤ 100 000, 3 ≤ mean word length ≤ 10, ≥ 80 % of words
    * contain an alphabetic character, ≥ 2 stopword occurrences. The two
    * ratio signals are single divisions of exact integer sums —
    * bit-stable in any engine, no stabilizer needed. Docs with zero kept
    * tokens have no row (they fail every corpus anyway).
    */
  def gopherQuality(docs: DataFrame,
                    minWords: Long = 50, maxWords: Long = 100000,
                    minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                    minAlphaFrac: Double = 0.8, minStop: Long = 2): DataFrame = {
    val g = tok(docs).groupBy("doc_id").agg(
      count(lit(1)).as("n_words"),
      sum(length(col("word"))).as("sum_len"),
      sum(when(col("word").rlike("[a-z]"), 1L).otherwise(0L)).as("n_alpha"),
      sum(when(col("word").isin(GopherStopwords: _*), 1L).otherwise(0L)).as("n_stop"))
    val meanLen = col("sum_len").cast("double") / col("n_words")
    val alphaFrac = col("n_alpha").cast("double") / col("n_words")
    g.select(col("doc_id"), col("n_words"), meanLen.as("mean_wlen"),
        alphaFrac.as("alpha_frac"), col("n_stop"),
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          meanLen >= minMeanLen && meanLen <= maxMeanLen &&
          alphaFrac >= minAlphaFrac && col("n_stop") >= minStop).as("keep"))
  }

  /** Per-doc Gopher repetition signals: the modal word's share of all
    * words and the modal 2-gram's share of all 2-gram slots, plus the
    * keep decision (Gopher's duplicate-2-gram bar: ≤ 0.20; top-word bar
    * kept alongside for the data card). Modal selection is deterministic:
    * highest count, then lexicographically smallest gram — expressed as
    * one `min(struct(-count, gram))` aggregate per doc, so the per-doc
    * state through the shuffle is ONE struct, never the gram histogram.
    * Docs need ≥ 2 words (a 2-gram must exist).
    */
  def gopherRepetition(docs: DataFrame, maxBigramFrac: Double = 0.2): DataFrame = {
    val t = tok(docs)
    val wordCnt = t.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    val topWord = wordCnt.groupBy("doc_id").agg(
      sum("c").as("n_words"),
      min(struct((-col("c")).as("nc"), col("word").as("g"))).as("m"))
    // 2-grams over the SAME token stream: adjacent kept tokens, built
    // row-locally from the filtered array (zip_with slices, no window)
    val arr = filter(TextOps.splitWords(lower(col("text"))),
      w => TextOps.isKeptToken(w))
    val n = size(col("arr"))
    val bg = docs.select(col("doc_id"), arr.as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("arr"), lit(1), n - 1),
        slice(col("arr"), lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b))).as("bigram"))
    val bgCnt = bg.groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
    val topBg = bgCnt.groupBy("doc_id").agg(
      sum("c").as("n_bigrams"),
      min(struct((-col("c")).as("nc"), col("bigram").as("g"))).as("m"))
    val bgFrac = (-col("b.m.nc")).cast("double") / col("b.n_bigrams")
    topWord.as("w").join(topBg.as("b"), "doc_id")
      .select(col("doc_id"), col("w.n_words").as("n_words"),
        col("w.m.g").as("top_word"),
        ((-col("w.m.nc")).cast("double") / col("w.n_words")).as("top_word_frac"),
        col("b.m.g").as("top_bigram"), bgFrac.as("top_bigram_frac"),
        (bgFrac <= maxBigramFrac).as("keep"))
  }

  /** Out-of-vocabulary rate per source against the corpus's own top-`k`
    * vocabulary (highest total count, ties to the lexicographically
    * smaller word) — the coverage statistic a tokenizer/data card reports
    * per slice. One token-count aggregate, a k-row TakeOrdered, a
    * broadcast semi-join back onto the token counts (never the token
    * stream twice), then a |sources|-row rollup.
    */
  def oovRate(docs: DataFrame, k: Int = 64): DataFrame = {
    val t = docs.select(col("source"),
        explode(TextOps.splitWords(lower(col("text")))).as("word"))
      .filter(TextOps.isKeptToken(col("word")))
    val counts = t.groupBy("source", "word").agg(count(lit(1)).as("c"))
      .localCheckpoint() // reused: vocab derivation + per-source rollup
    val vocab = counts.groupBy("word").agg(sum("c").as("total"))
      .orderBy(desc("total"), asc("word")).limit(k)
      .select("word")
    val flagged = counts.join(broadcast(vocab.withColumn("in_v", lit(1L))),
      Seq("word"), "left")
    flagged.groupBy("source").agg(
        sum("c").as("n_tokens"),
        sum(when(col("in_v").isNull, col("c")).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_frac"))
  }

  /** Per-doc word-distribution (Shannon) entropy — the gibberish/template
    * detector of the rule batteries: near-zero entropy is one word
    * repeated (templates, keyword stuffing), maximal entropy ln(n) is
    * all-distinct words. Computed as H = ln(n) − (Σ c·ln c)/n over the
    * per-doc word counts, with the Σ under the repo's dsum/stab
    * double-aggregation discipline (each c·ln c stab(6)'d, summed as
    * exact DECIMAL) so the aggregate is order-independent and the output
    * hash-gates in any engine.
    */
  def wordEntropy(docs: DataFrame): DataFrame = {
    import graft.functions.Stable
    val wc = tok(docs).groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    wc.groupBy("doc_id").agg(
        sum("c").as("n_words"),
        Stable.dsum(Stable.stab(col("c") * log(col("c")), 6), 6).as("sclnc"))
      .select(col("doc_id"), col("n_words"),
        Stable.stab(
          log(col("n_words")) - col("sclnc") / col("n_words"), 6).as("entropy"))
  }

  /** Per-source distinctive terms by TF-IDF over SOURCES as "documents":
    * score(s, w) = tf(s, w) · ln(|sources| / df(w)), top-`k` per source
    * (ties to the smaller word) — the "what characterizes this slice"
    * panel of a data card. One token aggregate, a |word-types|-row df
    * aggregate, a 1-row corpus cross, and a source-partitioned top-k
    * window (WindowGroupLimit — partitions are per-source word-type
    * tables, never the token stream). ln through stab(6) for the gate.
    */
  def sourceTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    val t = docs.select(col("source"),
        explode(TextOps.splitWords(lower(col("text")))).as("word"))
      .filter(TextOps.isKeptToken(col("word")))
    val tf = t.groupBy("source", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // reused: df derivation + scoring
    val dfw = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nSrc = tf.select("source").distinct()
      .agg(count(lit(1)).as("n_src"))
    val scored = tf.join(dfw, "word").crossJoin(broadcast(nSrc))
      .withColumn("score", graft.functions.Stable.stab(
        col("tf") * log(col("n_src").cast("double") / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(desc("score"), asc("word"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("source", "rk", "word", "score")
  }

  /** Per-doc distinctive keywords by TF-IDF over the corpus:
    * score(d, w) = tf(d, w) · ln(N / df(w)), top-`k` per doc (ties to
    * the smaller word) — the keyword panel a search/data-card UI shows
    * per document (sourceTerms' shape, per-DOC granularity). One token
    * aggregate (localCheckpoint'd — reused for df), a word-keyed df
    * aggregate joined back on the word, a 1-row doc count cross, and a
    * doc-partitioned top-k window (WindowGroupLimit; partitions are
    * per-doc word-type lists, never the token stream).
    */
  def docKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    import graft.functions.Stable
    val t = tok(docs)
    val tf = t.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // reused: df derivation + scoring
    val dfw = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfw, "word").crossJoin(broadcast(nDocs))
      .withColumn("score", Stable.stab(
        col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("score"), asc("word"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("doc_id", "rk", "word", "score")
  }

  /** Per-source distribution drift: KL(source ‖ corpus) over unigram
    * distributions — the data-card number that says WHICH slice's
    * language diverges from the blend (rising KL on an ingest source is
    * the classic silent-drift symptom; DSIR uses the same quantity with
    * the roles reversed). No smoothing is needed: the corpus
    * distribution dominates every source (p_C(w) > 0 wherever
    * p_s(w) > 0), so every term is finite by construction.
    *
    * Determinism: each term p_s·ln(p_s/p_C) is stab(6)'d, and the
    * per-source sum over word types rides the dsum discipline (exact
    * DECIMAL, order-free) — the wordEntropy treatment. One token
    * aggregate (localCheckpoint'd, reused for all three rollups), a
    * word-keyed join for corpus counts, |sources|-row output.
    */
  def sourceKlDrift(docs: DataFrame): DataFrame = {
    import graft.functions.Stable
    val t = docs.select(col("source"),
        explode(TextOps.splitWords(lower(col("text")))).as("word"))
      .filter(TextOps.isKeptToken(col("word")))
    val tf = t.groupBy("source", "word").agg(count(lit(1)).as("c"))
      .localCheckpoint() // reused: per-source totals, corpus counts, terms
    val ns = tf.groupBy("source").agg(sum("c").as("n_s"))
    val cw = tf.groupBy("word").agg(sum("c").as("c_w"))
    val nc = tf.agg(sum("c").as("n_c"))
    val ps = col("c").cast("double") / col("n_s").cast("double")
    val pc = col("c_w").cast("double") / col("n_c").cast("double")
    tf.join(broadcast(ns), "source").join(cw, "word").crossJoin(broadcast(nc))
      .withColumn("term", Stable.stab(ps * log(ps / pc), 6))
      .groupBy(col("source"), col("n_s").as("n_tokens"))
      .agg(Stable.dsum(col("term"), 6).as("kl"))
      .select("source", "n_tokens", "kl")
  }

  /** Group-consistent split: every doc of a source lands in the same
    * split, decided by the source's md5 (threshold `trainHex` on the
    * first 4 hex chars ≈ the train fraction). A per-doc hash split lets
    * near-duplicate docs from one domain straddle train/val — the
    * contamination a holdout exists to prevent; hashing the group closes
    * it. Row-local projection, no shuffle, no RNG.
    */
  def splitBySource(docs: DataFrame, salt: String = "gs",
                    trainHex: String = "cccc"): DataFrame =
    docs.select(col("doc_id"), col("source"),
      when(substring(md5(concat(lit(salt + ":"), col("source"))), 1, 4)
        < trainHex, "train").otherwise("val").as("split"))
}
