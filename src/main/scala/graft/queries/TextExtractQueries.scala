package graft.queries

import graft.GraftQuery
import graft.operators.TextExtract
import graft.sources.Tables

/** Raw-markup extraction registry — the pipeline's missing FIRST stage
  * (web page in, clean document out). All three queries run over the
  * deterministic HTML-wrapper fixture (`TextExtract.wrapped` — the driver's
  * documents are clean text, so markup is planted from md5 slices of doc_id
  * and re-derived identically by the DuckDB twin `wrappedSql`). The
  * extractor expressions are single-sourced from TextExtract into both
  * engines; the keep rule is integer-only, so there is no float surface.
  */
object TextExtractQueries {

  private val wrapCte = s"w AS (${TextExtract.wrappedSql("documents")})"

  private def pages(s: org.apache.spark.sql.SparkSession, d: String) =
    TextExtract.wrapped(Tables.documents(s, d).select("doc_id", "text"))

  /** pages over a SPREAD scan (see operators.Spread): the block walk +
    * entity unescape are expression-heavy and row-local, and the
    * single-row-group corpus parquet pins them to one scan task. Used by
    * the queries whose timed action EVALUATES the extraction
    * (blocks/clean); extract_html's benched count() prunes the
    * projection, so there the exchange would be pure overhead.
    */
  private def pagesSpread(s: org.apache.spark.sql.SparkSession, d: String) =
    TextExtract.wrapped(graft.operators.Spread(
      Tables.documents(s, d).select("doc_id", "text")))

  def all: Seq[GraftQuery] = Seq(

    // The headline: HTML page -> extracted document. Row-local block walk
    // (sentinel split + HOF filter/transform), boilerplate and link farms
    // dropped, inline anchors kept, entities unescaped, malformed pages
    // survive. No exchange before the gate's ORDER BY.
    GraftQuery("text_extract_html",
      (s, d) => TextExtract.extract(pages(s, d)).orderBy("doc_id"),
      Some(
        s"""WITH $wrapCte
           |SELECT doc_id, ${TextExtract.extractSql} AS text
           |FROM w ORDER BY doc_id""".stripMargin)),

    // Per-block audit view: position, tag, visible chars, anchor chars,
    // keep decision — the table a curation engineer tunes thresholds on.
    GraftQuery("text_extract_blocks",
      (s, d) => TextExtract.blocks(pagesSpread(s, d)).orderBy("doc_id", "pos"),
      Some(
        // the info struct (tag/txt/lc) is bound ONCE per block — the twin
        // of the Spark side's infoArr; keep + fields never re-run the
        // entity walk
        s"""WITH $wrapCte,
           |b AS (
           |  SELECT doc_id,
           |    unnest(list_transform(${TextExtract.infoSql},
           |      (s, i) -> {'pos': i, 's': s})) AS r
           |  FROM w),
           |c AS (SELECT doc_id, CAST(r['pos'] AS BIGINT) AS pos,
           |             r['s'] AS s FROM b)
           |SELECT doc_id, pos, s['tag'] AS tag,
           |  CAST(length(s['txt']) AS BIGINT) AS n_chars,
           |  CAST(s['lc'] AS BIGINT) AS n_link_chars,
           |  ${TextExtract.keepInfoSql("s")} AS kept
           |FROM c ORDER BY doc_id, pos""".stripMargin)),

    // The ingest chain closed: HTML page -> extracted document -> the
    // C4-style clean gate (length floor + quality floor + language
    // gate) — the curate pipeline's first two stages composed, web
    // markup in, training-ready doc set out. Boilerplate removal
    // changes the gate's inputs (nav/footer words never pollute the
    // stopword or digit ratios), which is exactly why extraction must
    // run FIRST. Both stages row-local; one hash aggregate.
    GraftQuery("text_extract_clean",
      (s, d) => graft.operators.TextAnalysis.cleanCorpus(
          TextExtract.extract(pagesSpread(s, d))).orderBy("doc_id"),
      Some(
        s"""WITH $wrapCte,
           |e AS (SELECT doc_id, ${TextExtract.extractSql} AS text FROM w),
           |${TextAnalysisQueries.cleanTokCteSql},
           |${TextAnalysisQueries.cleanGateTailSql}""".stripMargin)),

    // Corpus extraction card: the datasheet row (block/kept counts,
    // html-in vs text-out chars, empty extractions). Single-row aggregate
    // over row-locally derived per-doc numbers.
    GraftQuery("text_extract_stats",
      (s, d) => TextExtract.stats(pages(s, d)),
      Some(
        // info structs bound ONCE per row (p0/p1) — inlining extractSql
        // per derived column would re-run the full regex + entity walk
        // up to 6x per page on the decade-gate corpus
        s"""WITH $wrapCte,
           |p0 AS (SELECT doc_id, length(html) AS ci,
           |         ${TextExtract.infoSql} AS info FROM w),
           |p1 AS (
           |  SELECT doc_id, ci, len(info) AS nb,
           |    list_filter(info, s -> ${TextExtract.keepInfoSql("s")}) AS kept
           |  FROM p0),
           |p AS (
           |  SELECT doc_id, ci, nb, len(kept) AS nk,
           |    length(coalesce(array_to_string(
           |      list_transform(kept, s -> s['txt']),
           |      chr(10)), '')) AS co
           |  FROM p1)
           |SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(nb) AS BIGINT) AS n_blocks,
           |  CAST(sum(nk) AS BIGINT) AS n_kept,
           |  CAST(sum(ci) AS BIGINT) AS chars_html,
           |  CAST(sum(co) AS BIGINT) AS chars_out,
           |  CAST(sum(CASE WHEN co = 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_empty
           |FROM p""".stripMargin)))
}
