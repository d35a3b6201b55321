package graft.queries

import graft.GraftQuery
import graft.operators.TextExtract
import graft.sources.{Tables, Warc}

/** Crawl-record ingest registry — the stage BEFORE extraction: WARC-style
  * framed records in, canonical-URL-deduplicated pages out. The fixed
  * queries run over the deterministic 2-record blob fixture
  * (`Warc.records` over the HTML-wrapper pages); the `*_stream` queries
  * run over the VARIABLE-record fixture (`Warc.streamRecords`, 1..5
  * records per blob). Both fixtures plant "WARC/1.0" decoy payloads, so
  * only the Content-Length framing walk parses correctly — a delimiter
  * split would shear records; the DuckDB twins re-derive identical
  * blobs and walk them with an INDEPENDENT formulation (fixed unroll /
  * recursive CTE vs the Spark fold).
  */
object WarcQueries {

  private val wrapCte = s"w AS (${TextExtract.wrappedSql("documents")})"
  private val recCte = s"r AS (${Warc.recordsSql("w")})"
  private val parseCte = s"p AS (${Warc.parseSql("r")})"

  private val sbCte = s"sb AS (${Warc.streamRecordsSql("documents")})"

  // Spread the narrow scan BEFORE the heavy row-local projections (blob
  // build, framing walk, canonicalization): the single-row-group corpus
  // parquet yields a 1-split scan, which serialized this whole family on
  // one core (measured crawl_dedup_url 2.9 s wall ≈ its serial taskTime,
  // 3 tasks total on 32 cores). See operators.Spread for the scale guard.
  private def pages(s: org.apache.spark.sql.SparkSession, d: String) =
    TextExtract.wrapped(graft.operators.Spread(
      Tables.documents(s, d).select("doc_id", "text")))

  private def parsed(s: org.apache.spark.sql.SparkSession, d: String) =
    Warc.parse(Warc.records(pages(s, d)))

  private def parsedStream(s: org.apache.spark.sql.SparkSession, d: String) =
    Warc.parseStream(Warc.streamRecords(graft.operators.Spread(
      Tables.documents(s, d).select("doc_id"))))

  /** Canonical fetches CTE: response records only, canonical url. */
  private val canonCte =
    s"""c AS (SELECT ${Warc.canonicalSql("url")} AS url, wdate, doc_id
       |      FROM p WHERE wtype = 'response' AND ok)""".stripMargin

  /** Latest-fetch winners CTE over c (rank, not max-struct — DuckDB side
    * only; the Spark side stays the partial-aggregable max(struct)).
    */
  private val dedupCte =
    s"""d AS (SELECT url, doc_id, wdate FROM (
       |  SELECT url, doc_id, wdate,
       |    row_number() OVER (PARTITION BY url
       |      ORDER BY wdate DESC, doc_id DESC) AS rn
       |  FROM c) WHERE rn = 1)""".stripMargin

  def all: Seq[GraftQuery] = Seq(

    // The framing walk: version line + named headers + Content-Length
    // payload slice, 2 records per blob, ok = (version AND length
    // parses AND payload bytes == Content-Length). Row-local; the only
    // exchange is the gate sort's.
    GraftQuery("warc_parse",
      (s, d) => parsed(s, d)
        .select("doc_id", "rec", "wtype", "url", "wdate", "clen",
          "body_chars", "ok")
        .orderBy("doc_id", "rec"),
      Some(
        s"""WITH $wrapCte,
           |$recCte,
           |$parseCte
           |SELECT doc_id, rec, wtype, url, wdate, clen, body_chars, ok
           |FROM p ORDER BY doc_id, rec""".stripMargin)),

    // The ARBITRARY-record-count walk: 1..5 records per blob (decoy
    // payloads included), record starts discovered by a linear native
    // fold on the Spark side and a recursive CTE in the oracle — two
    // INDEPENDENT walk formulations that must land on identical frames.
    // Row-local; the only exchange is the gate sort's.
    GraftQuery("warc_parse_stream",
      (s, d) => parsedStream(s, d)
        .select("doc_id", "rec", "wtype", "url", "wdate", "clen",
          "body_chars", "ok")
        .orderBy("doc_id", "rec"),
      Some(
        s"""WITH RECURSIVE $sbCte,
           |${Warc.walkCteSql},
           |p AS (${Warc.parseStreamSql})
           |SELECT doc_id, rec, wtype, url, wdate, clen, body_chars, ok
           |FROM p ORDER BY doc_id, rec""".stripMargin)),

    // Crawl dedup over the VARIABLE-record stream: same latest-fetch
    // aggregate, fed by the fold walk — proves the dedup stage is
    // frame-source-agnostic (2-record and n-record heads compose with
    // the identical downstream plan).
    GraftQuery("crawl_dedup_stream",
      (s, d) => Warc.dedupLatest(parsedStream(s, d)).orderBy("url"),
      Some(
        s"""WITH RECURSIVE $sbCte,
           |${Warc.walkCteSql},
           |p AS (${Warc.parseStreamSql}),
           |$canonCte,
           |$dedupCte
           |SELECT url, doc_id, wdate FROM d ORDER BY url""".stripMargin)),

    // URL canonicalization over all 9 planted variants: lowercase
    // scheme+host, default-port strip, fragment strip, tracking-param
    // drop (order of the rest preserved), trailing-slash resolve.
    GraftQuery("url_canonical",
      (s, d) => {
        val u = Warc.urls(Tables.documents(s, d).select("doc_id", "text"))
        u.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("url"),
          Warc.canonicalUrl(org.apache.spark.sql.functions.col("url"))
            .as("canon"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH u AS (SELECT doc_id, ${Warc.urlSql} AS url FROM documents)
           |SELECT doc_id, url, ${Warc.canonicalSql("url")} AS canon
           |FROM u ORDER BY doc_id""".stripMargin)),

    // Crawl-level dedup: latest fetch per canonical URL. Spark side is
    // ONE partial-aggregable hash agg (max(struct(wdate, doc_id)) —
    // map-side combine collapses each partition to one candidate per
    // URL); the oracle ranks with a window. ISO dates sort
    // lexicographically; doc_id breaks ties.
    GraftQuery("crawl_dedup_url",
      (s, d) => Warc.dedupLatest(parsed(s, d)).orderBy("url"),
      Some(
        s"""WITH $wrapCte,
           |$recCte,
           |$parseCte,
           |$canonCte,
           |$dedupCte
           |SELECT url, doc_id, wdate FROM d ORDER BY url""".stripMargin)),

    // The pipeline head composed end to end: WARC blobs -> framing parse
    // -> canonical-URL dedup -> raw-markup extraction -> C4 clean gate.
    // Crawl in, training-ready docs out, one plan. Extraction runs only
    // on dedup WINNERS (the join precedes the block walk).
    GraftQuery("crawl_extract_clean",
      (s, d) => {
        val winners = Warc.dedupLatest(parsed(s, d)).select("doc_id")
        val ex = TextExtract.extract(pages(s, d).join(winners, "doc_id"))
        graft.operators.TextAnalysis.cleanCorpus(ex).orderBy("doc_id")
      },
      Some(
        s"""WITH $wrapCte,
           |$recCte,
           |$parseCte,
           |$canonCte,
           |$dedupCte,
           |e AS (SELECT w.doc_id, ${TextExtract.extractSql} AS text
           |      FROM w JOIN d USING (doc_id)),
           |${TextAnalysisQueries.cleanTokCteSql},
           |${TextAnalysisQueries.cleanGateTailSql}""".stripMargin)))
}
