package graft.queries

import graft.GraftQuery
import graft.operators.QualityRules
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Published rule-based quality filters (Gopher rules, OOV coverage,
  * group-consistent splitting) — registry + DuckDB twins. Every ratio in
  * these outputs is a single division of exact integer sums, so the hash
  * gate needs no stabilizer anywhere.
  */
object QualityQueries {

  def all: Seq[GraftQuery] = Seq(

    // Gopher quality rules (Rae et al. 2021, A1.1) per doc: word-count
    // bounds, mean-word-length band, alphabetic fraction, required
    // stopwords — the standard pre-model heuristic battery, as one
    // hash-aggregate pass (map-side partials, no windows).
    GraftQuery("text_gopher_quality",
      (s, d) => QualityRules.gopherQuality(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(
        s"""WITH ${SearchQueries.tokCte},
           |g AS (
           |  SELECT doc_id, count(*) AS n_words, sum(length(word)) AS sum_len,
           |    sum(CASE WHEN regexp_matches(word, '[a-z]') THEN 1 ELSE 0 END) AS n_alpha,
           |    sum(CASE WHEN word IN ('the','be','to','of','and','that','have','with')
           |        THEN 1 ELSE 0 END) AS n_stop
           |  FROM tok GROUP BY doc_id)
           |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           |  CAST(sum_len AS DOUBLE) / n_words AS mean_wlen,
           |  CAST(n_alpha AS DOUBLE) / n_words AS alpha_frac,
           |  CAST(n_stop AS BIGINT) AS n_stop,
           |  (n_words >= 50 AND n_words <= 100000
           |   AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
           |   AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
           |   AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
           |   AND n_stop >= 2) AS keep
           |FROM g ORDER BY doc_id""".stripMargin)),

    // Gopher repetition rules: the modal word's / modal 2-gram's share of
    // the doc, modal pick deterministic (count desc, gram asc). The Spark
    // side carries ONE struct per doc through each shuffle, never the
    // per-doc gram histogram.
    GraftQuery("text_gopher_repetition",
      (s, d) => QualityRules.gopherRepetition(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(
        s"""WITH ${SearchQueries.tokCte},
           |wc AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY 1, 2),
           |tw AS (
           |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           |    word AS top_word, c AS top_c
           |  FROM (
           |    SELECT doc_id, word, c, sum(c) OVER (PARTITION BY doc_id) AS n_words,
           |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, word) AS rn
           |    FROM wc) WHERE rn = 1),
           |arrs AS (
           |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'),
           |    w -> length(w) > 0 AND NOT regexp_matches(w, '^[0-9]+$$')) AS arr
           |  FROM documents),
           |bg AS (
           |  SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS bigram
           |  FROM arrs, unnest(range(1, len(arr))) t(i)
           |  WHERE len(arr) >= 2),
           |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
           |tb AS (
           |  SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           |    bigram AS top_bigram, c AS top_c
           |  FROM (
           |    SELECT doc_id, bigram, c, sum(c) OVER (PARTITION BY doc_id) AS n_bigrams,
           |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram) AS rn
           |    FROM bc) WHERE rn = 1)
           |SELECT tw.doc_id, tw.n_words, tw.top_word,
           |  CAST(tw.top_c AS DOUBLE) / tw.n_words AS top_word_frac,
           |  tb.top_bigram,
           |  CAST(tb.top_c AS DOUBLE) / tb.n_bigrams AS top_bigram_frac,
           |  (CAST(tb.top_c AS DOUBLE) / tb.n_bigrams <= 0.2) AS keep
           |FROM tw JOIN tb USING (doc_id) ORDER BY tw.doc_id""".stripMargin)),

    // Out-of-vocabulary rate per source against the corpus's top-64
    // vocabulary — the tokenizer-coverage line of a data card. Two hash
    // aggregates + one broadcast join of the 64-row vocab.
    GraftQuery("text_oov_rate",
      (s, d) => QualityRules.oovRate(Tables.documents(s, d))
        .orderBy("source"),
      Some(
        """WITH tok2 AS (
          |  SELECT source, w AS word FROM documents,
          |    unnest(regexp_split_to_array(lower(text), '\s+')) t(w)
          |  WHERE length(w) > 0 AND NOT regexp_matches(w, '^[0-9]+$')),
          |counts AS (SELECT source, word, count(*) AS c FROM tok2 GROUP BY 1, 2),
          |vocab AS (
          |  SELECT word FROM (
          |    SELECT word, sum(c) AS total FROM counts GROUP BY word)
          |  ORDER BY total DESC, word LIMIT 64),
          |j AS (
          |  SELECT c.source, c.c, v.word AS vw
          |  FROM counts c LEFT JOIN vocab v USING (word))
          |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
          |  CAST(sum(CASE WHEN vw IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
          |  CAST(sum(CASE WHEN vw IS NULL THEN c ELSE 0 END) AS DOUBLE)
          |    / sum(c) AS oov_frac
          |FROM j GROUP BY source ORDER BY source""".stripMargin)),

    // Per-doc word-distribution entropy (gibberish/template detector):
    // H = ln(n) − (Σ c·ln c)/n over word counts, the Σ under the
    // dsum/stab discipline so the aggregate is order-independent.
    GraftQuery("text_word_entropy",
      (s, d) => QualityRules.wordEntropy(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(
        s"""WITH ${SearchQueries.tokCte},
           |wc AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY 1, 2),
           |g AS (
           |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
           |    CAST(sum(CAST(floor(c * ln(c) * 1000000.0 + 0.5) / 1000000.0
           |      AS DECIMAL(18,6))) AS DOUBLE) AS sclnc
           |  FROM wc GROUP BY doc_id)
           |SELECT doc_id, n_words,
           |  floor((ln(n_words) - sclnc / n_words) * 1000000.0 + 0.5)
           |    / 1000000.0 AS entropy
           |FROM g ORDER BY doc_id""".stripMargin)),

    // Per-source distinctive terms (TF-IDF over sources as "documents",
    // top-5, ties to the smaller word) — the "what characterizes this
    // slice" panel of a data card. Source-partitioned top-k window over
    // word-type tables, never the token stream.
    // Per-source KL(source ‖ corpus) unigram drift — the "which slice
    // diverges from the blend" data-card number; finite without
    // smoothing because the corpus dominates every source.
    GraftQuery("text_kl_drift",
      (s, d) => QualityRules.sourceKlDrift(Tables.documents(s, d))
        .orderBy("source"),
      Some(
        """WITH tok2 AS (
          |  SELECT source, w AS word FROM documents,
          |    unnest(regexp_split_to_array(lower(text), '\s+')) t(w)
          |  WHERE length(w) > 0 AND NOT regexp_matches(w, '^[0-9]+$')),
          |tf AS (SELECT source, word, count(*) AS c FROM tok2 GROUP BY 1, 2),
          |ns AS (SELECT source, sum(c) AS n_s FROM tf GROUP BY 1),
          |cw AS (SELECT word, sum(c) AS c_w FROM tf GROUP BY 1),
          |nc AS (SELECT sum(c) AS n_c FROM tf),
          |tm AS (
          |  SELECT tf.source, CAST(ns.n_s AS BIGINT) AS n_tokens,
          |    floor((CAST(tf.c AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
          |      * ln((CAST(tf.c AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
          |        / (CAST(cw.c_w AS DOUBLE) / CAST((SELECT n_c FROM nc) AS DOUBLE)))
          |      * 1000000.0 + 0.5) / 1000000.0 AS term
          |  FROM tf JOIN ns USING (source) JOIN cw USING (word))
          |SELECT source, n_tokens,
          |  CAST(CAST(sum(CAST(term AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS kl
          |FROM tm GROUP BY source, n_tokens ORDER BY source""".stripMargin)),

    // Per-doc TF-IDF keywords, top-3 (ties to the smaller word) — the
    // document-granular sibling of text_source_terms; window partitions
    // are per-doc word-type lists, never the token stream.
    GraftQuery("text_keywords",
      (s, d) => QualityRules.docKeywords(Tables.documents(s, d))
        .orderBy("doc_id", "rk"),
      Some(
        s"""WITH ${SearchQueries.tokCte},
           |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
           |dft AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
           |nd AS (SELECT count(*) AS n_docs FROM documents),
           |sc AS (
           |  SELECT tf.doc_id, tf.word,
           |    floor((tf * ln((SELECT n_docs FROM nd) * 1.0 / df))
           |      * 1000000.0 + 0.5) / 1000000.0 AS score
           |  FROM tf JOIN dft USING (word)),
           |r AS (
           |  SELECT doc_id, word, score,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rk
           |  FROM sc)
           |SELECT doc_id, CAST(rk AS BIGINT) AS rk, word, score
           |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    GraftQuery("text_source_terms",
      (s, d) => QualityRules.sourceTerms(Tables.documents(s, d))
        .orderBy("source", "rk"),
      Some(
        """WITH tok2 AS (
          |  SELECT source, w AS word FROM documents,
          |    unnest(regexp_split_to_array(lower(text), '\s+')) t(w)
          |  WHERE length(w) > 0 AND NOT regexp_matches(w, '^[0-9]+$')),
          |tf AS (SELECT source, word, count(*) AS tf FROM tok2 GROUP BY 1, 2),
          |dft AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
          |ns AS (SELECT count(DISTINCT source) AS n_src FROM tf),
          |sc AS (
          |  SELECT tf.source, tf.word,
          |    floor((tf * ln((SELECT n_src FROM ns) * 1.0 / df))
          |      * 1000000.0 + 0.5) / 1000000.0 AS score
          |  FROM tf JOIN dft USING (word)),
          |r AS (
          |  SELECT source, word, score,
          |    row_number() OVER (PARTITION BY source ORDER BY score DESC, word) AS rk
          |  FROM sc)
          |SELECT source, CAST(rk AS BIGINT) AS rk, word, score
          |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin)),

    // Group-consistent holdout: split decided by the SOURCE's hash, so
    // intra-domain near-duplicates can never straddle train/val — the
    // leakage a per-doc hash split (text_split) cannot prevent. Row-local.
    GraftQuery("text_split_source",
      (s, d) => QualityRules.splitBySource(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id, source,
          |  CASE WHEN substr(md5('gs:' || source), 1, 4) < 'cccc'
          |       THEN 'train' ELSE 'val' END AS split
          |FROM documents ORDER BY doc_id""".stripMargin)))
}
