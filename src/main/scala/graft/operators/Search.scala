package graft.operators

import graft.functions.{Stable, TextOps}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's full capability surface — a batch TF-IDF search engine
  * (SURVEY.md §2, operators V1..Q8) — rebuilt as lazy Catalyst plans over the
  * `documents` table (doc_id↔id, text↔text; source/lang stand in for
  * url/title).
  *
  * Scale posture (100 TB): everything below is declarative DataFrame code —
  * one corpus scan feeds vocabulary/doc-info/postings branches (vs 3 scans in
  * the reference); the vocabulary side of every join is broadcast (the
  * reference's setup()-loaded side HashMaps, Indexer.java:42-73, done
  * properly); aggregations get map-side partials from Catalyst (the reference
  * forgot the combiner on its TF job, Indexer.java:108-140); top-k plans as
  * TakeOrderedAndProject (per-partition heaps + driver merge) instead of the
  * reference's single-reducer global sort (Query.java:278).
  *
  * The only intentionally non-scalable piece is the single-partition
  * `row_number` window assigning word ids — vocabulary cardinality is bounded
  * (natural-language vocab ≪ corpus size) and the reference's id semantics
  * (sequential in word order, Vocabulary.java:90,103 — quirk Q-a) demand a
  * total order. It runs over the *aggregated* vocabulary, never the corpus.
  */
object Search {

  /** Default search string. The reference's default is "the good person"
    * (Query.java:27); the synthetic documents vocabulary (31 words) doesn't
    * contain "good"/"person", so the flagship query uses terms that exist —
    * with a repeated term to exercise query-side tf > 1.
    */
  val DefaultQuery = "the fast table scan the"

  /** V1+V3: corpus → (doc_id, word) token stream (RE2-safe tier; see
    * TextOps). One row per occurrence.
    */
  def tokens(docs: DataFrame): DataFrame = {
    val w = explode(TextOps.splitWords(TextOps.normalize(col("text")))).as("word")
    docs.select(col("doc_id"), w).filter(TextOps.isKeptToken(col("word")))
  }

  /** (doc_id, word, tf) — the shared first aggregation: postings are a
    * projection of it, and vocabulary df is a count over it. Deriving both
    * from this one subtree lets Catalyst's ReuseExchange compute the
    * tokenize + first shuffle ONCE per query instead of once per branch.
    */
  def docWordCounts(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))

  /** V4+V5: vocabulary — word → (df, word_id), ids sequential in word
    * order per quirk Q-a; df via the partial+final hash aggregate Catalyst
    * plans (the reference's hand-written combiner, Vocabulary.java:58-79,
    * for free).
    */
  def vocabulary(docs: DataFrame): DataFrame = {
    // metadata-scale path: probe the SOURCE scan (derived frames carry
    // aggregates and must not be probed), pin + cut — see vocabularyFrom
    val tiny = Spread.isTiny(docs)
    val src = if (tiny) docs.coalesce(1) else docs
    vocabularyFrom(docWordCounts(src), tiny)
  }

  /** Id assignment is the classic distributed dense-rank: a naive
    * `row_number().over(Window.orderBy("word"))` would funnel the whole
    * vocabulary through ONE partition. Instead, ranks are computed in
    * parallel per first-character group (tokens are [a-z0-9]+, so groups
    * sort-align with the global word order), and each group's starting
    * offset is a running-sum window over the ≤36-row prefix-count
    * aggregate — computed IN-PLAN (no eager collect, so building a query
    * that embeds a vocabulary rebuild triggers no Spark job before its
    * action) and broadcast to the rank join. The single-partition window
    * only ever sees the ≤36 aggregated prefix rows, never the vocabulary.
    * Ids are identical to the single-partition formulation.
    */
  def vocabularyFrom(byDocWord: DataFrame, tiny: Boolean = false): DataFrame = {
    // `tiny` (round 19): the word-level aggregate below feeds TWO
    // branches (prefix offsets + the rank join); at scale ReuseExchange
    // dedups the upstream tokenize, but on the SinglePartition-pinned
    // metadata path there is no exchange to reuse — an eager
    // localCheckpoint of the (vocab-bounded) aggregate cuts the shared
    // subtree instead, so the corpus is still tokenized exactly once.
    val agg0 = byDocWord
      .groupBy("word").agg(count(lit(1)).as("df")) // rows are distinct (doc,word)
      .withColumn("pfx", substring(col("word"), 1, 1))
    val agg = if (tiny) agg0.localCheckpoint(false) else agg0 // lazy — see queryPostings
    val offsets = agg.groupBy("pfx").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(
        sum("n").over(Window.orderBy("pfx")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pfx", "off")
    agg.join(broadcast(offsets), "pfx")
      .withColumn("word_id",
        (col("off") + row_number().over(Window.partitionBy("pfx").orderBy("word")) - 1)
          .cast("long"))
      .select("word", "df", "word_id")
  }

  /** P1/P2: document metadata table (ParseDocument.java collapses to a
    * projection on the shared corpus scan — no shuffle, no second job).
    */
  def docInfo(docs: DataFrame): DataFrame =
    docs.select("doc_id", "source", "lang", "n_chars")

  /** I1-I3: postings (doc_id, word_id, tf). The vocab side is broadcast —
    * the reference's per-map-task side-file reload (Indexer.java:42-73) as a
    * real torrent-shipped broadcast; the two-key count gets automatic
    * map-side partial aggregation.
    */
  def postings(docs: DataFrame, vocab: DataFrame): DataFrame =
    postingsFrom(docWordCounts(docs), vocab)

  def postingsFrom(byDocWord: DataFrame, vocab: DataFrame): DataFrame =
    byDocWord
      .join(broadcast(vocab.select("word", "word_id")), "word")
      .select("doc_id", "word_id", "tf")

  /** Q1: driver-side query translation (Query.java:48-58) — tokenize the
    * query string with the same rules, emit (word, qtf). Tiny by
    * construction; becomes the broadcast side of the scoring join.
    */
  def queryTerms(spark: SparkSession, query: String): DataFrame = {
    import spark.implicits._
    TextOps.tokenizeScala(TextOps.filterTextScala(query))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
      .toSeq.toDF("word", "qtf")
  }

  /** Per-query postings: (doc_id, word, tf, df) for query terms only.
    * Scoring never needs word ids, so the token stream is filtered to the
    * ≤|q| query words right after explode (narrow — nothing but matching
    * occurrences ever reaches a shuffle), tf is the usual two-key count,
    * and df is a ≤|q|-row aggregate broadcast back onto the postings.
    * df via groupBy + broadcast join, NOT a count window partitioned by
    * word: map-side partials mean the final aggregate for a stopword key
    * sees one row per task, where a window would materialize every
    * posting of "the" in a single partition — a straggler at corpus
    * scale. Both consumers fork off the SAME (doc_id, word, tf)
    * aggregate, and the df branch aggregates `sum(least(tf, 1))` — tf >= 1
    * by construction, so value-equal to count(*), but written as a real
    * function of tf because the obvious count(tf) is rewritten to
    * count(1) (tf is non-null) and the tf column pruned, which
    * specializes the df branch's copy of the subtree and kills exchange
    * reuse. With tf genuinely consumed, the two exchange inputs stay
    * canonically identical and ReuseExchange computes the tokenize +
    * first shuffle ONCE (plan-shape-locked: one Generate explode). The full
    * vocabulary (global ids, prefix offsets) is only materialized by
    * queries whose OUTPUT contains ids — vocab_build, postings_tf, the
    * persisted index.
    */
  def queryPostings(docs: DataFrame, query: String): DataFrame = {
    val qwords = TextOps.tokenizeScala(TextOps.filterTextScala(query)).distinct
    // Round-19 metadata-scale path (guide §2.4): on a tiny single-split
    // scan, pin to SinglePartition and CUT the shared (doc_id, word, tf)
    // subtree with an eager localCheckpoint — post is query-term-filtered
    // (≤ |q| words' occurrences aggregated per doc), so the materialized
    // table is small by construction. Both consumers (df branch + join)
    // then read the checkpointed partition, tokenize runs exactly once
    // (the invariant the PlanShapeSpec lock pins), and with the
    // shuffle_hash hint the df join plans exchange-free — ONE stage where
    // the reuse-dependent broadcast form paid 4+ AQE stage jobs. At
    // production split counts `tiny` is false and the plan is unchanged
    // (ReuseExchange dedups the tokenize, df broadcasts).
    val tiny = Spread.isTiny(docs)
    val src = if (tiny) docs.coalesce(1) else docs
    val post0 = tokens(src).filter(col("word").isin(qwords: _*))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    // lazy checkpoint: plan construction stays job-free (SearchSpec's
    // zero-jobs lock); the first consumer materializes the partition and
    // the second reads the persisted blocks
    val post = if (tiny) post0.localCheckpoint(false) else post0
    val df = post.groupBy("word").agg(sum(least(col("tf"), lit(1L))).as("df"))
    if (tiny) post.join(df.hint("shuffle_hash"), "word")
    else post.join(broadcast(df), "word")
  }

  /** Q2-Q4 core: reference scoring over the single-pass query postings. */
  private def scoresInPlan(spark: SparkSession, docs: DataFrame,
                           query: String): DataFrame =
    queryPostings(docs, query)
      .join(broadcast(queryTerms(spark, query)), "word")
      .select(col("doc_id"),
        (col("tf") * col("qtf") / (col("df").cast("double") * col("df"))).as("part"))
      .groupBy("doc_id")
      .agg(Stable.stab(sum(col("part")), 9).as("score"))

  /** Q2-Q8: score + top-k. Scoring formula is the reference's exactly
    * (quirk Q-b, Query.java:113-115): score(d) = Σ_{w∈q∩d} tf_d·tf_q/df².
    * No log, no N/df — replicated for parity. Plans as ONE corpus
    * tokenize + two query-term-sized shuffles + TakeOrderedAndProject;
    * doc metadata joins the tiny top-k result via broadcast. Ties break on
    * doc_id (quirk Q-d) and the limit is exact k (quirk Q-c's k+1
    * off-by-one is a bug, not replicated — documented in SearchSpec).
    */
  def searchTopK(spark: SparkSession, dir: String,
                 query: String = DefaultQuery, k: Int = 10): DataFrame = {
    // Round-19 (guide §2.4 remove shuffles outright): the profile read
    // 7 AQE stage jobs for 0.4 s of task time — scheduler latency on
    // query-term-sized aggregates. A tiny single-split scan pinned to
    // SinglePartition (guarded — no-op at production split counts) lets
    // every downstream aggregate/join plan exchange-free.
    val docs = Spread.tight(Tables.documents(spark, dir))
    scoresInPlan(spark, docs, query)
      .orderBy(desc("score"), asc("doc_id")).limit(k)
      .join(broadcast(docInfo(docs).select("doc_id", "source", "lang")), "doc_id")
      .select("doc_id", "score", "source", "lang")
      .orderBy(desc("score"), asc("doc_id"))
  }

  /** BM25 top-k — the standard probabilistic ranking beside the parity
    * (tf·qtf/df²) and log-idf variants:
    *
    *   score(d) = Σ_{w∈q∩d} ln((N−df+0.5)/(df+0.5)+1) · qtf ·
    *              tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *
    * (Robertson idf, k1/b the classic 1.2/0.75). Needs two corpus token
    * passes — the query-filtered postings AND per-doc lengths (dl counts
    * ALL kept tokens, so the isin filter can't be shared) — but dl/avgdl
    * are pure corpus statistics a deployment precomputes once per corpus
    * (text_token_counts is that table), so the benched form's second
    * pass is the worst case, not the steady state. Determinism: dl sums
    * are integer-valued doubles (exact in any order), avgdl is one
    * division of exact sums, ln is stab(6)-collapsed like log-idf.
    */
  def searchTopKBm25(spark: SparkSession, dir: String,
                     query: String = DefaultQuery, k: Int = 10,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // guarded SinglePartition pin — see searchTopK
    val docs = Spread.tight(Tables.documents(spark, dir))
    val dl = tokens(docs).groupBy("doc_id")
      .agg(count(lit(1)).cast("double").as("dl"))
    // sum/count explicitly (not avg): dl is integer-valued, so the sum is
    // EXACT under any aggregation order and avgdl is bit-stable across
    // engines with no stabilizer
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum("dl") / count(lit(1))).as("avgdl"))
    val scored = queryPostings(docs, query)
      .join(broadcast(queryTerms(spark, query)), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          col("qtf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))).as("part"))
      .groupBy("doc_id")
      .agg(Stable.stab(sum(col("part")), 6).as("score"))
    scored.orderBy(desc("score"), asc("doc_id")).limit(k)
      .join(broadcast(docInfo(docs).select("doc_id", "source", "lang")), "doc_id")
      .select("doc_id", "score", "source", "lang")
      .orderBy(desc("score"), asc("doc_id"))
  }

  /** BM25 with PRECOMPUTED length statistics — the steady-state form of
    * the non-indexed tier. `searchTopKBm25`'s second corpus token pass
    * only exists to derive per-doc lengths; a deployment refreshes that
    * (doc_id, n_tokens) table once per corpus version (the index-b2
    * docinfo already carries it), so the benched one-shot form's two
    * passes collapse to ONE — the query-filtered postings scan — plus a
    * docinfo-sized read. Identical answer to `searchTopKBm25` /
    * `searchTopKBm25Indexed` (one oracle gates all three tiers);
    * zero-kept-token docs carry n_tokens = 0 in the stats table and are
    * excluded from N/avgdl exactly like the in-plan twin's dl table.
    */
  def searchTopKBm25Stats(spark: SparkSession, dir: String, dlStats: DataFrame,
                          query: String = DefaultQuery, k: Int = 10,
                          k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // guarded SinglePartition pin — see searchTopK
    val docs = Spread.tight(Tables.documents(spark, dir))
    val dl = dlStats.filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens").cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum("dl") / count(lit(1))).as("avgdl"))
    val scored = queryPostings(docs, query)
      .join(broadcast(queryTerms(spark, query)), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          col("qtf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))).as("part"))
      .groupBy("doc_id")
      .agg(Stable.stab(sum(col("part")), 6).as("score"))
    scored.orderBy(desc("score"), asc("doc_id")).limit(k)
      .join(broadcast(docInfo(docs).select("doc_id", "source", "lang")), "doc_id")
      .select("doc_id", "score", "source", "lang")
      .orderBy(desc("score"), asc("doc_id"))
  }

  /** Shared Q2-Q8 tail over any (postings, vocab, docinfo) triple. */
  /** Exact-phrase top-k (adjacent 2-token match): docs containing the
    * phrase, ranked by its per-doc frequency. The match count is a
    * ROW-LOCAL array filter over the doc's bigram stream — no explode, no
    * shuffle before the top-k heap. The bigram stream is built with
    * `zip_with` over two slices of the token array, NOT
    * `transform(sequence(...), i => element_at(arr, i))`: higher-order
    * functions run interpreted, and the indexed-lambda form re-enters the
    * element_at path per index — measured 17× slower at sf0.1 (19.4 s vs
    * 1.2 s) for identical output. A production deployment would serve
    * this from bigram postings (same layout as the unigram index); the
    * scan shape here IS that index's build pass.
    */
  def evalMetrics(docs: DataFrame, nQueries: Int = 20, k: Int = 10): DataFrame = {
    // Distributed retrieval EVALUATION — the offline quality job a search
    // pipeline runs on every index build, as ONE batch plan instead of a
    // per-query loop: a deterministic query set (consecutive-word-id
    // pairs from the corpus's own vocabulary), every query scored
    // against every matching posting in a single broadcast join, ranks
    // via per-query windows (≤ nQueries partitions), and graded-
    // relevance-free metrics (P@k, MRR@k, with relevance := "doc
    // contains BOTH query terms" — boolean-AND qrels both engines can
    // derive). The per-(query, doc) term-presence count doubles as the
    // relevance label, so scoring and labeling share one aggregate.
    import graft.functions.Stable
    // metadata-scale path (round 19): bdw feeds the vocabulary AND the
    // postings branch, vocab is consumed three times — cut both shared
    // subtrees when the source scan is tiny (see queryPostings)
    val tiny = Spread.isTiny(docs)
    val src = if (tiny) docs.coalesce(1) else docs
    val bdw0 = docWordCounts(src)
    val bdw = if (tiny) bdw0.localCheckpoint(false) else bdw0
    val vocab0 = vocabularyFrom(bdw, tiny)
    val vocab = if (tiny) vocab0.localCheckpoint(false) else vocab0
    val post = postingsFrom(bdw, vocab)
      .join(broadcast(vocab.select("word_id", "df")), "word_id")
    val qt = vocab.select((col("word_id") / 2).cast("long").as("query_id"),
        col("word_id"))
      .filter(col("query_id") < nQueries)
    val scored = post.join(broadcast(qt), "word_id")
      .groupBy("query_id", "doc_id")
      .agg(Stable.stab(sum(col("tf").cast("double") / (col("df") * col("df"))), 9)
          .as("score"),
        countDistinct("word_id").as("n_terms"))
    val ranked = scored.withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))))
      .filter(col("rnk") <= k)
    val nRel = scored.filter(col("n_terms") === 2)
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val perQ = ranked.filter(col("n_terms") === 2)
      .groupBy("query_id").agg(count(lit(1)).as("hits"), min("rnk").as("first_rel"))
    qt.select("query_id").distinct()
      .join(nRel, Seq("query_id"), "left")
      .join(perQ, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        (coalesce(col("hits"), lit(0L)).cast("double") / k).as("p_at_k"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("mrr"))
      .orderBy("query_id")
  }

  def phraseTopK(spark: SparkSession, dir: String,
                 phrase: String = "table hash", k: Int = 10): DataFrame = {
    // Spread: the row-local bigram scoring ran in the single scan task of
    // the one-row-group corpus parquet (see operators.Spread); the top-k
    // heap merge is partition-count-agnostic
    val docs = Spread(Tables.documents(spark, dir))
    val arr = TextOps.splitWords(TextOps.normalize(col("text")))
    val n = size(col("arr"))
    val bigrams = zip_with(
      slice(col("arr"), lit(1), n - 1),
      slice(col("arr"), lit(2), n - 1),
      (a, b) => concat_ws(" ", a, b))
    docs.select(col("doc_id"), arr.as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(col("doc_id"),
        size(filter(bigrams, b => b === lit(phrase))).cast("long").as("phrase_tf"))
      .filter(col("phrase_tf") >= 1)
      .orderBy(desc("phrase_tf"), asc("doc_id")).limit(k)
      .join(broadcast(docInfo(docs).select("doc_id", "source", "lang")), "doc_id")
      .select("doc_id", "phrase_tf", "source", "lang")
      .orderBy(desc("phrase_tf"), asc("doc_id"))
  }

  private def scoreAndRank(spark: SparkSession, post: DataFrame, vocab: DataFrame,
                           docinfo: DataFrame, query: String, k: Int): DataFrame = {
    val qt = queryTerms(spark, query)
      .join(vocab, "word") // keep df + word_id; drops non-vocab terms (I2 semantics)
      .select("word_id", "qtf", "df")
    val scores = post
      .join(broadcast(qt), "word_id")
      .select(col("doc_id"),
        (col("tf") * col("qtf") / (col("df").cast("double") * col("df"))).as("part"))
      .groupBy("doc_id")
      .agg(Stable.stab(sum(col("part")), 9).as("score"))
    scores
      .orderBy(desc("score"), asc("doc_id")).limit(k)
      .join(broadcast(docinfo.select("doc_id", "source", "lang")), "doc_id")
      .select("doc_id", "score", "source", "lang")
      .orderBy(desc("score"), asc("doc_id"))
  }

  /** Number of word-id hash buckets the persisted postings are partitioned
    * into. At 100 TB this is the lever that turns a query into a handful of
    * directory reads: postings land in `wb=<word_id % buckets>` dirs, and a
    * q-term query prunes to ≤q of them at file-listing time.
    */
  val IndexBuckets = 16

  /** Build-once index: vocabulary, doc-info, and word-bucket-partitioned
    * postings as parquet under `indexDir`. The reference re-derives its
    * index inputs per job and re-reads side files per map task
    * (Indexer.java:42-73); here the corpus is scanned once and every later
    * query is scan-free. Doc-info carries `n_tokens` (kept-token count —
    * the BM25 document length), so length-normalized ranking is served
    * from the index with no corpus scan; docs whose every token is
    * filtered keep a 0 row (left join) and are excluded from the BM25
    * corpus statistics at query time, matching the in-plan twin.
    */
  def buildIndex(spark: SparkSession, dir: String, indexDir: String): Unit = {
    val docs = Tables.documents(spark, dir)
    val vocab = vocabulary(docs).cache()
    // all three tables land under ONE DirSwap marker scope: a crashed
    // (re)build can never leave postings complete but docinfo missing (the
    // previous sequential overwrite-writes could, and the gate only
    // checked postings)
    DirSwap.swap(indexDir, Seq(
      "vocabulary" -> { out => vocab.write.parquet(out) },
      "postings" -> { out =>
        postings(docs, vocab)
          .withColumn("wb", pmod(col("word_id"), lit(IndexBuckets)).cast("int"))
          .repartition(col("wb"))
          .write.partitionBy("wb").parquet(out)
      },
      "docinfo" -> { out =>
        docInfo(docs)
          .join(tokens(docs).groupBy("doc_id").agg(count(lit(1)).as("n_tokens")),
            Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_tokens"))
          .write.parquet(out)
      }))
    vocab.unpersist()
  }

  /** The reference user's exact entry point (Query.java:247-294): free-text
    * query over a WikiExtractor JSON-lines corpus dir → top-k
    * (title, url), score-descending. One Catalyst plan replaces the
    * reference's 5 chained MapReduce jobs; output columns match the
    * reference's result table (`title \t url`, Query.java:236-240) with the
    * deterministic doc_id tie-break (quirk Q-d) and exact k (quirk Q-c
    * documented as a bug, not replicated).
    */
  def searchCorpus(spark: SparkSession, corpusDir: String,
                   query: String = "the good person", k: Int = 10): DataFrame = {
    val corpus = Tables.corpusJson(spark, corpusDir)
    // guarded SinglePartition pin — see searchTopK
    val docs = Spread.tight(corpus.select(col("id").as("doc_id"), col("text")))
    scoresInPlan(spark, docs, query)
      .orderBy(desc("score"), asc("doc_id")).limit(k)
      .join(broadcast(corpus.select(col("id").as("doc_id"), col("url"), col("title"))),
        "doc_id")
      .orderBy(desc("score"), asc("doc_id"))
      .select("title", "url")
  }

  // ---- typed boundary (Dataset[T] views of the pipeline edges) ----

  import graft.model._
  import org.apache.spark.sql.{Dataset, Encoders}

  def vocabularyDS(docs: DataFrame): Dataset[VocabEntry] =
    vocabulary(docs).as(Encoders.product[VocabEntry])

  def postingsDS(docs: DataFrame): Dataset[Posting] =
    postings(docs, vocabulary(docs)).select("doc_id", "word_id", "tf")
      .as(Encoders.product[Posting])

  def searchTopKDS(spark: SparkSession, dir: String,
                   query: String = DefaultQuery, k: Int = 10): Dataset[SearchHit] =
    searchTopK(spark, dir, query, k).as(Encoders.product[SearchHit])

  /** Query the persisted index. The postings scan carries a `wb IN (...)`
    * predicate computed from the query's own word ids, so partition pruning
    * skips every bucket directory the query doesn't touch — the plan reads
    * O(query terms) buckets regardless of corpus size. Result is identical
    * to `searchTopK` (same formula, same tie-break).
    */
  def searchTopKIndexed(spark: SparkSession, indexDir: String,
                        query: String = DefaultQuery, k: Int = 10): DataFrame = {
    val vocab = spark.read.parquet(s"$indexDir/vocabulary")
    val docinfo = spark.read.parquet(s"$indexDir/docinfo")
    val qWordIds = queryTerms(spark, query).join(vocab, "word")
      .select("word_id").collect().map(_.getLong(0)) // ≤ |query terms| rows
    val qBuckets = qWordIds.map(w => (w % IndexBuckets).toInt).distinct.toSeq
    // guarded SinglePartition pin on the bucket-pruned scan (≤ |q| bucket
    // dirs; at a production index each bucket is many splits → no-op)
    val post = Spread.tight(spark.read.parquet(s"$indexDir/postings")
      .filter(col("wb").isin(qBuckets: _*)))
    scoreAndRank(spark, post, vocab, docinfo, query, k)
  }

  /** BM25 served from the persisted index — identical answer to
    * `searchTopKBm25` (same oracle gates both), with ZERO corpus scans:
    * tf/df from the bucket-pruned postings and vocabulary, document
    * lengths from docinfo's `n_tokens`, corpus statistics (N, avgdl) a
    * docinfo-sized aggregate. This is the deployment shape — the in-plan
    * twin's two corpus token passes become index reads, which is the
    * whole point of carrying dl in the index.
    */
  def searchTopKBm25Indexed(spark: SparkSession, indexDir: String,
                            query: String = DefaultQuery, k: Int = 10,
                            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val vocab = spark.read.parquet(s"$indexDir/vocabulary")
    val docinfo = spark.read.parquet(s"$indexDir/docinfo")
    val qt = queryTerms(spark, query).join(vocab, "word")
      .select("word_id", "qtf", "df")
    val qWordIds = qt.select("word_id").collect().map(_.getLong(0)) // ≤ |q| rows
    val qBuckets = qWordIds.map(w => (w % IndexBuckets).toInt).distinct.toSeq
    // guarded SinglePartition pin — see searchTopKIndexed
    val post = Spread.tight(spark.read.parquet(s"$indexDir/postings")
      .filter(col("wb").isin(qBuckets: _*)))
    // docs whose every token was filtered carry n_tokens = 0 and are
    // excluded from the corpus statistics — matching the in-plan twin,
    // whose dl table only has rows for docs with ≥ 1 kept token
    val dl = docinfo.filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens").cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum("dl") / count(lit(1))).as("avgdl"))
    val scored = post
      .join(broadcast(qt), "word_id")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          col("qtf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))).as("part"))
      .groupBy("doc_id")
      .agg(Stable.stab(sum(col("part")), 6).as("score"))
    scored.orderBy(desc("score"), asc("doc_id")).limit(k)
      .join(broadcast(docinfo.select("doc_id", "source", "lang")), "doc_id")
      .select("doc_id", "score", "source", "lang")
      .orderBy(desc("score"), asc("doc_id"))
  }
}
