package graft.operators

import graft.functions.{Stable, TimeOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recency-weighted (exponentially decayed) aggregates over an event
  * stream — the standard freshness feature of ranking/abuse/engagement
  * models: an event's contribution halves every `halfLifeMs`, so a
  * user's score reflects recent behavior without any windowing cutoff.
  *
  * Shape: one scan; "now" is the stream's max timestamp taken IN-PLAN
  * (1-row broadcast cross, the DSIR pattern — no driver collect, no
  * wall-clock dependence, so the result is a pure function of the
  * input). Decay weights are per-row arithmetic; the per-user sum runs
  * as ordinary partial+final hash aggregation.
  *
  * Determinism: the age is exact integer millis; the single pow/divide
  * per row is IEEE arithmetic whose last-ulp spread the stab(6) on the
  * product collapses; the per-user sum goes through dsum (exact
  * decimal, order-independent). Cross-engine gated in events_decay.
  */
object Decay {

  /** Per-user decayed value sum + event count. Output:
    * (user_id, n_events, decayed), decayed = Σ value·0.5^(age/halfLife).
    */
  def decayedUserValue(events: DataFrame, halfLifeMs: Long): DataFrame = {
    val ev = events.select(col("user_id"), col("value"),
      TimeOps.epochMs(col("ts")).as("es"))
    val now = ev.agg(max("es").as("now")) // 1 row
    val w = pow(lit(0.5),
      (col("now") - col("es")).cast("double") / lit(halfLifeMs.toDouble))
    ev.crossJoin(broadcast(now))
      .select(col("user_id"), Stable.stab(col("value") * w, 6).as("dv"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        Stable.stab(Stable.dsum(col("dv"), 6), 6).as("decayed"))
  }
}
