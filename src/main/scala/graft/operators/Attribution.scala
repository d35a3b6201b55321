package graft.operators

import graft.functions.Stable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — the conversion-credit rollup beside the
  * last-touch as-of join (`events_asof_attrib`): instead of crediting the
  * single most recent touch, a conversion's value splits EQUALLY across
  * every qualifying touch in the lookback window (the "linear" model of
  * marketing analytics).
  *
  * Scale shape: one equi-join on user_id (conversions × touches only meet
  * within a user — the funnel/sessionize bound), a row-local window
  * filter, and a conversion-partitioned count window (partitions bounded
  * by one conversion's touches inside the lookback). Credits are
  * row-local stab(6) divisions — no cross-conversion double sums, so the
  * per-pair table is engine-exact; a per-channel rollup is one
  * exact-decimal dsum away.
  */
object Attribution {

  /** Per (conversion, touch) credit rows: every `touchType` event of the
    * same user with touch_ts ∈ [conv_ts − window, conv_ts] gets
    * value / n_touches. Conversions with zero qualifying touches emit
    * nothing (their value is unattributable under this model).
    */
  def linear(events: DataFrame, convType: String = "purchase",
             touchType: String = "click",
             windowExpr: String = "24 hours"): DataFrame = {
    val conv = events.filter(col("event_type") === convType)
      .select(col("event_id").as("conv_event_id"), col("user_id"),
        col("ts").as("conv_ts"), col("value"))
    val touch = events.filter(col("event_type") === touchType)
      .select(col("user_id"), col("event_id").as("touch_event_id"),
        col("ts").as("touch_ts"))
    val pairs = conv.join(touch, Seq("user_id"))
      .filter(col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - expr(s"INTERVAL $windowExpr"))
    val w = Window.partitionBy("conv_event_id")
    pairs.withColumn("n_touches", count(lit(1)).over(w))
      .select(col("conv_event_id"), col("touch_event_id"), col("user_id"),
        col("n_touches"),
        Stable.stab(col("value") / col("n_touches"), 6).as("credit"))
  }
}
