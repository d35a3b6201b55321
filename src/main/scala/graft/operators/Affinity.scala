package graft.operators

import graft.functions.Stable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-scoped co-occurrence affinity — the "users who did A in a
  * session also did B" statistic behind related-items panels and
  * behavioral segmentation, scored as pointwise mutual information:
  *
  *   pmi(a, b) = ln( n_ab · N / (n_a · n_b) )
  *
  * over SESSION incidence (n_x = sessions containing x, N = sessions) —
  * positive when the pair co-occurs above independence, negative below.
  *
  * Scale shape: the only corpus-scale stages are the sessionizer's
  * per-user window and one distinct over (user, session, type); the
  * pair stage self-joins the distinct incidence table ON THE SESSION KEY,
  * so each session contributes at most |types|² pairs (event-type
  * cardinality is bounded by contract — the markov/stationary argument),
  * and every aggregate output is |types|²-bounded. The incidence table is
  * localCheckpoint'd once and reused by all three rollups.
  */
object Affinity {

  def cooccurPmi(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val st = Sessionize.eventSessions(events, gapMinutes)
      .select("user_id", "session_id", "event_type").distinct()
      .localCheckpoint() // reused: totals, singles, pairs
    val total = st.select("user_id", "session_id").distinct()
      .agg(count(lit(1)).as("ns"))
    val singles = st.groupBy("event_type").agg(count(lit(1)).as("n"))
    val pairs = st.as("a").join(st.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_id") === col("b.session_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(singles.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"), col("n_b"),
        Stable.stab(log(
          (col("n_ab").cast("double") * col("ns").cast("double")) /
            (col("n_a").cast("double") * col("n_b").cast("double"))), 6).as("pmi"))
  }
}
