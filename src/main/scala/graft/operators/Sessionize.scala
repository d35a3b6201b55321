package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.TimeOps

/** Gap-based sessionization (batch). Streaming twin: EventStreams.sessions
  * (flatMapGroupsWithState) — same gap semantics under event-time state.
  *
  * Millisecond-epoch arithmetic (not interval types) so the DuckDB oracle is
  * integer-exact. Two windows over the same (user_id, ts, event_id)
  * ordering → one shuffle on user_id; both window passes run in the same
  * sorted partition.
  */
object Sessionize {

  /** Every event with its gap-session id attached — the pre-rollup
    * projection `sessions` aggregates and session-scoped analytics
    * (Affinity.cooccurPmi) consume directly.
    */
  def eventSessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMs = gapMinutes * 60000L
    val ms = TimeOps.epochMs(col("ts")) // NTZ-safe: parquet ts may read as TIMESTAMP_NTZ
    events
      .withColumn("new_s",
        when(ms - lag(ms, 1).over(byUser) <= gapMs, 0L).otherwise(1L))
      .withColumn("session_id", sum("new_s").over(byUser))
  }

  def sessions(events: DataFrame, gapMinutes: Int): DataFrame =
    eventSessions(events, gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
}
