package graft.queries

import graft.GraftQuery
import graft.operators.Pii
import graft.sources.Tables

/** PII curation registry: detection counts, redaction, corpus audit.
  * All three run over the planted-contact fixture (`Pii.planted` — the
  * driver's documents carry no digits, so PII is planted deterministically
  * from md5 slices of doc_id and re-derived identically by the DuckDB twin
  * `Pii.plantedSql`). Patterns are interpolated from `Pii.Patterns` into
  * both engines — single-sourced, no drift.
  */
object PiiQueries {

  private val piiCte = s"pii AS (${Pii.plantedSql("documents")})"

  private val detectCols = Pii.Patterns.map { case (name, rx, _) =>
    s"CAST(len(regexp_extract_all(text, '$rx')) AS BIGINT) AS n_$name"
  }.mkString(",\n  ")

  def all: Seq[GraftQuery] = Seq(

    // Per-doc PII hit counts + any-flag. Row-local codegen'd regex scan —
    // the 100-TB shape: no exchange before the gate's ORDER BY.
    GraftQuery("text_pii_detect",
      (s, d) => Pii.detect(Pii.planted(
        Tables.documents(s, d).select("doc_id", "text"))).orderBy("doc_id"),
      Some(
        s"""WITH $piiCte,
           |d AS (
           |  SELECT doc_id,
           |  $detectCols
           |  FROM pii)
           |SELECT doc_id, n_email, n_phone, n_ip, n_id,
           |  (n_email > 0 OR n_phone > 0 OR n_ip > 0 OR n_id > 0) AS has_pii
           |FROM d ORDER BY doc_id""".stripMargin)),

    // Redacted corpus: every match scrubbed to its typed placeholder in
    // fixed pattern order (email first). String-identical across engines.
    GraftQuery("text_pii_redact",
      (s, d) => Pii.redact(Pii.planted(
        Tables.documents(s, d).select("doc_id", "text"))).orderBy("doc_id"),
      Some {
        val scrubbed = Pii.Patterns.foldLeft("text") {
          case (e, (_, rx, repl)) => s"regexp_replace($e, '$rx', '$repl', 'g')"
        }
        s"""WITH $piiCte
           |SELECT doc_id, $scrubbed AS text
           |FROM pii ORDER BY doc_id""".stripMargin
      }),

    // Corpus audit: one row of per-type totals + affected-doc count — the
    // number a datasheet quotes. Single-row hash aggregate.
    GraftQuery("text_pii_stats",
      (s, d) => Pii.stats(Pii.planted(
        Tables.documents(s, d).select("doc_id", "text"))),
      Some {
        val sums = Pii.Patterns.map { case (name, _, _) =>
          s"CAST(sum(n_$name) AS BIGINT) AS n_$name"
        }.mkString(", ")
        s"""WITH $piiCte,
           |d AS (
           |  SELECT doc_id,
           |  $detectCols
           |  FROM pii)
           |SELECT $sums,
           |  CAST(sum(CASE WHEN n_email > 0 OR n_phone > 0 OR n_ip > 0
           |                     OR n_id > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS docs_with_pii,
           |  CAST(count(*) AS BIGINT) AS n_docs
           |FROM d""".stripMargin
      }))
}
