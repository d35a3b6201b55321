package graft.queries

import graft.GraftQuery
import graft.operators.Selection
import graft.sources.Tables
import org.apache.spark.sql.functions.col

/** DSIR-style importance-weighted data selection, hash-gated end to end.
  * The oracle mirrors the integer micro-nat design: the only floating-point
  * step is the per-bucket ln (stab(6)-collapsed to BIGINT, B rows); every
  * corpus-scale aggregate is exact integer arithmetic, so the DuckDB twin
  * matches bit-for-bit with no dsum machinery.
  */
object SelectionQueries {

  private val B = Selection.Buckets
  private val K = 100
  /** The target domain: `source = 'src0'` stands in for the curated
    * in-domain corpus a real pipeline would supply.
    */
  private val TargetSql = "source = 'src0'"

  /** Shared CTE chain ending in `w(doc_id, n_grams, lw)` — the weights
    * pipeline: gram stream → bucket → model counts → λ table → per-doc
    * integer score.
    */
  private val weightsCtes: String =
    s"""d AS (SELECT doc_id, source, regexp_split_to_array(lower(text), '\\s+') AS arr FROM documents),
       |g AS (
       |  SELECT doc_id, source, arr[i] AS g
       |  FROM d, unnest(range(1, len(arr) + 1)) t(i)
       |  UNION ALL
       |  SELECT doc_id, source, arr[i] || ' ' || arr[i+1] AS g
       |  FROM d, unnest(range(1, len(arr))) t(i)
       |  WHERE len(arr) >= 2),
       |f AS (
       |  SELECT doc_id, source,
       |    CAST(CONCAT('0x', substr(md5(g), 1, 15)) AS BIGINT) % $B AS b
       |  FROM g),
       |cnt AS (
       |  SELECT b, count(*) AS cr,
       |    sum(CASE WHEN $TargetSql THEN 1 ELSE 0 END) AS ct
       |  FROM f GROUP BY b),
       |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr, CAST(sum(ct) AS BIGINT) AS tt FROM cnt),
       |lam AS (
       |  SELECT b, CAST(floor(ln((CAST(ct + 1 AS DOUBLE) * (tr + $B)) /
       |    CAST((cr + 1) * (tt + $B) AS BIGINT))*1000000.0+0.5) AS BIGINT) AS lam_micro
       |  FROM cnt, tot),
       |fc AS (SELECT doc_id, b, count(*) AS c FROM f GROUP BY doc_id, b),
       |w AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |    CAST(sum(c * lam_micro) AS BIGINT) AS lw
       |  FROM fc JOIN lam USING (b) GROUP BY doc_id)""".stripMargin

  def all: Seq[GraftQuery] = Seq(

    // Per-document importance weights against the src0 target domain.
    GraftQuery("text_dsir_weights",
      // Spread: the unigram+bigram gram scan ran in one task (see operators.Spread)
      (s, d) => Selection.weights(
        graft.operators.Spread(Tables.documents(s, d)), col("source") === "src0")
        .orderBy("doc_id"),
      Some(
        s"""WITH $weightsCtes
           |SELECT doc_id, n_grams, CAST(lw AS DOUBLE)/1000000.0 AS logw
           |FROM w ORDER BY doc_id""".stripMargin)),

    // The selection: top-K raw docs by weight, ranked, deterministic ties.
    GraftQuery("text_dsir_select",
      (s, d) => Selection.selectTopK(graft.operators.Spread(Tables.documents(s, d)),
        col("source") === "src0", K),
      Some(
        s"""WITH $weightsCtes,
           |r AS (
           |  SELECT row_number() OVER (ORDER BY CAST(lw AS DOUBLE)/1000000.0 DESC, doc_id) AS rank,
           |    doc_id, n_grams, CAST(lw AS DOUBLE)/1000000.0 AS logw
           |  FROM w)
           |SELECT rank, doc_id, n_grams, logw FROM r
           |WHERE rank <= $K ORDER BY rank""".stripMargin))
  )
}
