package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the second classic event-pipeline matrix next to the
  * funnel: bucket users by the day of their FIRST event, then count how
  * many of each cohort come back k days later.
  *
  * Scale shape: one user-keyed min aggregate builds the cohort table
  * (aggregate-sized — one row per user), an equi-join tags every event
  * with its user's cohort (shuffle on user_id both sides; AQE picks
  * broadcast when the user count allows, but it is NOT forced — at 1e9
  * users the cohort table is no broadcast candidate), then a distinct on
  * (user, cohort, offset) and a count aggregate. No window over the event
  * corpus, no driver round trips.
  */
object Retention {

  /** (cohort_day DATE, day_offset INT, n_users BIGINT), offsets bounded
    * by `horizonDays` (a retention report always bounds its matrix; the
    * bound also caps the distinct's key space).
    */
  def matrix(events: DataFrame, horizonDays: Int = 7): DataFrame = {
    val first = events.groupBy("user_id")
      .agg(to_date(min("ts")).as("cohort_day"))
    events.join(first, "user_id")
      .select(col("user_id"), col("cohort_day"),
        datediff(to_date(col("ts")), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= horizonDays)
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
