package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-entity outlier flagging over an event stream — the 3σ rule, but
  * formulated so it is EXACT and engine-portable: no mean, no stddev,
  * no sqrt, no doubles anywhere in the decision.
  *
  * (x − μ)² > k²σ²  ⇔  (n·x − S₁)² > k²·(n·S₂ − S₁²)
  *
  * with S₁ = Σx, S₂ = Σx² over the entity's events, all in integer
  * cents (the value column is 2-decimal by fixture contract; round to
  * cents recovers the exact integers from double noise). Both sides of
  * the inequality are exact integer expressions, so the flagged set is
  * identical under any aggregation order and in any engine — the
  * floating-point z-score formulation would need a stabilizer at every
  * step and still break ties differently.
  *
  * The moments and their products are carried as DECIMAL(38,0), not
  * BIGINT (round 12): at production magnitudes (|c| ~ 10⁶ cents,
  * n ~ 10⁵ events/entity) n·S₂ and (n·x − S₁)² exceed int64 and would
  * wrap silently in non-ANSI Spark — decimal keeps the rule exact up to
  * 38 digits (10³⁸ ≈ 2¹²⁶, the same headroom as DuckDB's HUGEINT, which
  * the oracle twin reaches via explicit HUGEINT casts). The decision is
  * still pure integer arithmetic; only the carrier widened.
  *
  * Shape: one aggregate pass for the per-entity moment sums (three
  * longs per entity), broadcast back onto the stream for the row-local
  * test — the textbook two-pass over the raw events, with nothing but
  * the |entities|-row moment table crossing stages.
  */
object Anomaly {

  /** Events whose value deviates more than `k` population standard
    * deviations from their user's mean. Output: (event_id, user_id,
    * value), anomalous rows only.
    */
  def sigmaOutliers(events: DataFrame, k: Int = 3): DataFrame = {
    val ev = events.select(col("event_id"), col("user_id"), col("value"),
      round(col("value") * 100).cast("long").as("c"))
    val cd = col("c").cast("decimal(38,0)")
    val st = ev.groupBy("user_id")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"), sum(cd).as("s1"),
        sum(cd * cd).as("s2"))
      .localCheckpoint() // |users| rows; joined back onto the stream
    val dev = col("n") * col("c") - col("s1")
    ev.join(broadcast(st), "user_id")
      .filter(dev * dev > lit(k.toLong * k) * (col("n") * col("s2") - col("s1") * col("s1")))
      .select("event_id", "user_id", "value")
  }
}
