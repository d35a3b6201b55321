package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence path analytics — the onboarding-flow rollup beside
  * funnels (`Funnel`) and the cohort matrix (`Retention.matrix`).
  *
  * Scale shape: one per-USER window (partitions bounded by a user's own
  * events, the sessionization bound) prunes to `depth` rows per user via
  * WindowGroupLimit, then two hash aggregates collapse to |users| and
  * |distinct paths| rows. No window ever sees more than one user.
  */
object Paths {

  /** Top starting event paths: each user's first `depth` events (by ts,
    * event_id — a total order, so the path is deterministic), concatenated
    * `a>b>c`, counted across users, top-`topK` by count (ties to the
    * lexicographically smaller path). The drop-off-shape query of product
    * analytics.
    */
  def userPaths(events: DataFrame, depth: Int = 3, topK: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val firstN = events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= depth)
    // ordered concat without relying on collect_list order: sort the
    // (rn, type) structs row-locally, then project the types out
    val path = firstN.groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("rn"), col("event_type")))).as("s"))
      .select(col("user_id"),
        concat_ws(">", transform(col("s"), x => x.getField("event_type"))).as("path"))
    path.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), asc("path"))
      .limit(topK)
  }
}
