package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-domain registries in
  * graft.queries (search pipeline, relational coverage, dedup, similarity,
  * text analysis, events, multimodal). Column names are aliased identically
  * in the Spark plans and the DuckDB SQL — the driver's compare sorts
  * columns by name before hashing.
  */
object SparkEntry {

  /** Flagship: the reference's whole Query.java path (vocabulary → postings
    * → df²-scored top-k → doc-info join) as one Catalyst plan, on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Search.searchTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** DuckDB twin for each SQL-expressible query (same column names). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
