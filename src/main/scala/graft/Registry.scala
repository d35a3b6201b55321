package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: a Spark plan builder plus (when SQL-expressible) the
  * ANSI-SQL twin the driver runs in DuckDB for the hash-match gate.
  * `oracle = None` → the driver records a weaker rows-only check.
  *
  * Every query (both sides) ends in a deterministic ORDER BY over a unique
  * key set, so the comparison is robust whether or not the harness sorts
  * rows before hashing.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true) // false → correctness-gate only (e.g. a deliberately quadratic exact-verify twin)

object Registry {
  def all: Seq[GraftQuery] =
    graft.queries.SearchQueries.all ++
      graft.queries.RelationalQueries.all ++
      graft.queries.DedupQueries.all ++
      graft.queries.SimilarityQueries.all ++
      graft.queries.TextAnalysisQueries.all ++
      graft.queries.EventQueries.all ++
      graft.queries.MultimodalQueries.all ++
      graft.queries.GraphQueries.all ++
      graft.queries.BpeQueries.all ++
      graft.queries.SemDedupQueries.all ++
      graft.queries.SelectionQueries.all ++
      graft.queries.QualityQueries.all ++
      graft.queries.PiiQueries.all ++
      graft.queries.PcaQueries.all ++
      graft.queries.ClassifierQueries.all ++
      graft.queries.QuantizeQueries.all ++
      graft.queries.RpQueries.all ++
      graft.queries.UlmQueries.all ++
      graft.queries.TextExtractQueries.all ++
      graft.queries.WarcQueries.all
}
