package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Synthetic Zipf-vocabulary corpus — the fixture the scale-tier dedup
  * claims stand on.
  *
  * The driver's `documents` fixture has a 31-word vocabulary: every
  * 3-shingle is corpus-common, so prefix filtering has no rare shingles to
  * exploit and LSH/simhash bucket-selectivity claims rested on analysis,
  * not measurement (round-7 verdict #2). This corpus has a realistic
  * skewed token distribution — three df tiers mixing like stopwords /
  * mid-frequency / long-tail vocabulary:
  *
  *   P(token is one of 10 stopwords)         = 0.40   (each ≈ 4% of tokens)
  *   P(token from 2 000 mid-frequency words) = 0.30
  *   P(token from 200 000 tail words)        = 0.30   (df ≈ 1 at test SF)
  *
  * plus BOILERPLATE: every doc_id ≡ 0 (mod 4) opens with the same fixed
  * 8-token header (h0..h7) — the repeated-phrase structure real corpora
  * have (license headers, navigation chrome), whose shingles reach
  * df ≈ N/4 and make the plain inverted-index join pay Σ df² ≈ N²/16 per
  * header shingle. This — not the random-draw tail — is the hot-shingle
  * blowup the prefix filter exists to remove.
  *
  * Every draw is integer arithmetic over md5 slices of (seed ":" i) — the
  * repo's established cross-engine digest trick — so DuckDB re-derives the
  * identical corpus in SQL and the dedup queries over it stay hash-gated.
  * Slices are ≤ 48 bits, well inside exact BIGINT/double-mantissa range in
  * both engines.
  *
  * Near-dup structure: doc_id ≡ 1 (mod 50) re-uses the PREVIOUS doc's
  * token stream (seed = doc_id − 1) at its own length — normally one token
  * longer/shorter, giving Jaccard ≈ (L−2)/(L−1) ≈ 0.97 pairs the
  * threshold-0.8 queries must find (a few wrap-around pairs with larger
  * length deltas legitimately fall below threshold; both engines agree).
  */
object ZipfCorpus {

  /** Spark-side token for position `i` of seed `seed` (both string cols). */
  private def tok(seed: Column, i: Column): Column = {
    val k = concat(seed, lit(":"), i.cast("string"))
    val u = conv(substring(md5(k), 1, 6), 16, 10).cast("long") % 100
    val h2 = conv(substring(md5(k), 7, 12), 16, 10).cast("long")
    val r = when(u < 40, h2 % 10)
      .when(u < 70, lit(10) + h2 % 2000)
      .otherwise(lit(2010) + h2 % 200000)
    concat(lit("w"), r.cast("string"))
  }

  /** Synthesize the corpus over an id column: (doc_id, text), length
    * 30..50 generated tokens (+ 8 boilerplate on every 4th doc). Narrow
    * (one projection per row), deterministic.
    */
  def synth(ids: DataFrame): DataFrame =
    synthFor(ids.select(col("doc_id"), col("doc_id").as("sid")))

  /** `text(sid)` for an explicit SEED id column — byte-for-byte the text
    * `synth` produces for `doc_id = sid` (same copy rule, header rule,
    * and length draw, all keyed on `sid`). Input: (doc_id, sid) pairs;
    * output (doc_id, text). This is how a RE-CRAWL batch is synthesized:
    * sid = an existing id reproduces that doc's content exactly (a
    * re-fetch, or — under a fresh doc_id — a mirror of existing content),
    * while a fresh sid is genuinely new content. The DuckDB twin is
    * `textCtes`.
    */
  def synthFor(pairs: DataFrame): DataFrame = {
    val sid = col("sid")
    val seedN = sid - when(sid % 50 === 1, 1L).otherwise(0L)
    val seed = seedN.cast("string")
    val len = (lit(30) + sid % 21).cast("int")
    val body = transform(sequence(lit(0), len - 1), i => tok(seed, i))
    val header = array((0 until 8).map(k => lit(s"h$k")): _*)
    // boilerplate keys on the SEED, so a near-dup copy duplicates the
    // whole doc — header included — and the planted pair stays ≥ 0.8
    val toks = when(seedN % 4 === 0, concat(header, body)).otherwise(body)
    pairs.select(col("doc_id"), array_join(toks, " ").as("text"))
  }

  /** Mutated-copy variant — the partial-overlap structure real near-dups
    * have (boilerplate plus edits), vs `synth`'s whole-stream copies at
    * J ≈ 0.97. Every doc_id ≡ 1 (mod 25) re-uses the previous doc's
    * stream, but each position mutates independently with probability
    * 1/50 (an md5-slice draw keyed "doc:m:i", redrawn from the full
    * vocabulary under seed "m<doc>"). One mutated token kills up to
    * three 3-shingles of ~40, so copies land at J ≈ 0.95+ (no
    * mutations, ~45 %), ≈ 0.80–0.85 (one mutation — straddling the 0.8
    * working threshold), or below (two-plus) — a GRADED distribution
    * around the threshold instead of planted certainties, which is what
    * makes borderline-pair agreement between the plain/prefix/LSH tiers
    * worth hash-gating. Same integer-md5 arithmetic, so the DuckDB
    * oracle re-derives the identical corpus.
    */
  def synthMutated(ids: DataFrame): DataFrame = {
    val isCopy = col("doc_id") % 25 === 1
    val seedN = col("doc_id") - when(isCopy, 1L).otherwise(0L)
    val seed = seedN.cast("string")
    val own = col("doc_id").cast("string")
    val len = (lit(30) + col("doc_id") % 21).cast("int")
    val body = transform(sequence(lit(0), len - 1), i => {
      val mutKey = concat(own, lit(":m:"), i.cast("string"))
      val isMut = isCopy &&
        conv(substring(md5(mutKey), 1, 6), 16, 10).cast("long") % 50 === 0
      when(isMut, tok(concat(lit("m"), own), i)).otherwise(tok(seed, i))
    })
    val header = array((0 until 8).map(k => lit(s"h$k")): _*)
    val toks = when(seedN % 4 === 0, concat(header, body)).otherwise(body)
    ids.select(col("doc_id"), array_join(toks, " ").as("text"))
  }

  /** DuckDB twin: CTEs `zd` → `ztok` → `sh` (distinct 3-shingles) over the
    * same md5-slice token derivation — compose with the shared shk/jaccard
    * tails. Generates shingles directly from the token stream (equivalent
    * to the Spark side's text → normalize → split round trip: tokens are
    * already lowercase alphanumerics joined by single spaces).
    */
  val shingleCte: String =
    """zd AS (
      |  SELECT doc_id,
      |    doc_id - CASE WHEN doc_id % 50 = 1 THEN 1 ELSE 0 END AS seed_n,
      |    CAST(doc_id - CASE WHEN doc_id % 50 = 1 THEN 1 ELSE 0 END AS VARCHAR) AS seed,
      |    30 + doc_id % 21 AS len
      |  FROM documents),
      |ztok AS (
      |  SELECT doc_id, i,
      |    'w' || CAST(CASE WHEN u < 40 THEN h2 % 10
      |                     WHEN u < 70 THEN 10 + h2 % 2000
      |                     ELSE 2010 + h2 % 200000 END AS VARCHAR) AS tok
      |  FROM (
      |    SELECT doc_id, i,
      |      CAST(CONCAT('0x', substr(md5(seed || ':' || CAST(i AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS u,
      |      CAST(CONCAT('0x', substr(md5(seed || ':' || CAST(i AS VARCHAR)), 7, 12)) AS BIGINT) AS h2
      |    FROM zd, unnest(range(0, len)) t(i))
      |  UNION ALL
      |  SELECT doc_id, k - 8 AS i, 'h' || CAST(k AS VARCHAR) AS tok
      |  FROM zd, unnest(range(0, 8)) t(k)
      |  WHERE seed_n % 4 = 0),
      |sh AS (
      |  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      |  FROM ztok a
      |  JOIN ztok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  JOIN ztok c ON a.doc_id = c.doc_id AND c.i = a.i + 2)""".stripMargin

  /** DuckDB twin of `synthFor`: given the name of a CTE `pairs(b, s)`
    * (b = batch doc_id, s = content seed), emits a CTE chain — names
    * prefixed with `p` — ending in `${p}txt(doc_id, text)` where `text`
    * is the full reconstructed document string (header + body,
    * space-joined in position order), exactly what `synthFor` emits for
    * the same pairs. Built on DuckDB's ordered `string_agg`.
    */
  def textCtes(pairs: String, p: String): String =
    s"""${p}zd AS (
       |  SELECT b, s - CASE WHEN s % 50 = 1 THEN 1 ELSE 0 END AS seed_n,
       |    CAST(s - CASE WHEN s % 50 = 1 THEN 1 ELSE 0 END AS VARCHAR) AS seed,
       |    30 + s % 21 AS len
       |  FROM $pairs),
       |${p}tok AS (
       |  SELECT b, i,
       |    'w' || CAST(CASE WHEN u < 40 THEN h2 % 10
       |                     WHEN u < 70 THEN 10 + h2 % 2000
       |                     ELSE 2010 + h2 % 200000 END AS VARCHAR) AS tok
       |  FROM (
       |    SELECT b, i,
       |      CAST(CONCAT('0x', substr(md5(seed || ':' || CAST(i AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS u,
       |      CAST(CONCAT('0x', substr(md5(seed || ':' || CAST(i AS VARCHAR)), 7, 12)) AS BIGINT) AS h2
       |    FROM ${p}zd, unnest(range(0, len)) t(i))
       |  UNION ALL
       |  SELECT b, k - 8 AS i, 'h' || CAST(k AS VARCHAR) AS tok
       |  FROM ${p}zd, unnest(range(0, 8)) t(k)
       |  WHERE seed_n % 4 = 0),
       |${p}txt AS (
       |  SELECT b AS doc_id, string_agg(tok, ' ' ORDER BY i) AS text
       |  FROM ${p}tok GROUP BY b)""".stripMargin

  /** DuckDB twin of `synthMutated` — the same CTE chain with the copy
    * rule at mod 25 and the per-position mutation redraw (key string
    * chosen per (doc, i) before the token draw, mirroring the Spark
    * side's conditional seed).
    */
  val mutatedShingleCte: String =
    """zd AS (
      |  SELECT doc_id,
      |    doc_id - CASE WHEN doc_id % 25 = 1 THEN 1 ELSE 0 END AS seed_n,
      |    CAST(doc_id - CASE WHEN doc_id % 25 = 1 THEN 1 ELSE 0 END AS VARCHAR) AS seed,
      |    30 + doc_id % 21 AS len
      |  FROM documents),
      |ztok AS (
      |  SELECT doc_id, i,
      |    'w' || CAST(CASE WHEN u < 40 THEN h2 % 10
      |                     WHEN u < 70 THEN 10 + h2 % 2000
      |                     ELSE 2010 + h2 % 200000 END AS VARCHAR) AS tok
      |  FROM (
      |    SELECT doc_id, i,
      |      CAST(CONCAT('0x', substr(md5(k), 1, 6)) AS BIGINT) % 100 AS u,
      |      CAST(CONCAT('0x', substr(md5(k), 7, 12)) AS BIGINT) AS h2
      |    FROM (
      |      SELECT doc_id, i,
      |        CONCAT(CASE WHEN doc_id % 25 = 1 AND
      |                   CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':m:' || CAST(i AS VARCHAR)), 1, 6)) AS BIGINT) % 50 = 0
      |              THEN 'm' || CAST(doc_id AS VARCHAR) ELSE seed END,
      |          ':', CAST(i AS VARCHAR)) AS k
      |      FROM zd, unnest(range(0, len)) t(i)))
      |  UNION ALL
      |  SELECT doc_id, k - 8 AS i, 'h' || CAST(k AS VARCHAR) AS tok
      |  FROM zd, unnest(range(0, 8)) t(k)
      |  WHERE seed_n % 4 = 0),
      |sh AS (
      |  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      |  FROM ztok a
      |  JOIN ztok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  JOIN ztok c ON a.doc_id = c.doc_id AND c.i = a.i + 2)""".stripMargin
}
