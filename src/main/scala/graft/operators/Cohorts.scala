package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) user segmentation — the classic
  * marketing rollup, in the repo's scalable-exact quantile form: instead
  * of an unpartitioned `ntile` (which serializes every user through one
  * window task — the round-11 deciles lesson), each metric's quintile is
  * assigned from its CUMULATIVE HISTOGRAM: q(v) = ⌈B·cum(v)/n⌉ with
  * cum(v) = #users with metric ≤ v. The histogram window is
  * metric-cardinality-bounded, the assignment is an equi-join, and ties
  * get the SAME bucket (better semantics than ntile's arbitrary tie
  * split, and deterministic in any engine).
  */
object Rfm {

  import graft.functions.Stable

  /** (user_id, last_ts, n_events, total_value, r_q, f_q, m_q), quintile
    * 5 = most recent / most frequent / highest spend.
    */
  def segments(events: DataFrame, buckets: Int = 5): DataFrame = {
    val agg = events.groupBy("user_id").agg(
        max("ts").as("last_ts"), count(lit(1)).as("n_events"),
        Stable.dsum(col("value"), 2).as("total_value"))
      // recency at DAY granularity (the conventional RFM resolution) so
      // the r histogram is |days|-bounded — ms-exact recency is ~unique
      // per user and would rebuild the very |users|-row window this shape
      // exists to avoid (round-12 review finding)
      .withColumn("r_ms", graft.functions.TimeOps.epochMs(col("last_ts")))
      .withColumn("r_v", expr("r_ms div 86400000"))
      // monetary at whole-DOLLAR granularity for the same reason: exact
      // cent totals are ~unique per user; the dollar grid bounds the
      // histogram at the value range (the micro-unit-histogram argument
      // the deciles family already makes)
      .withColumn("m_c", round(col("total_value") * 100).cast("long"))
      // TRUNCATING division, matching the oracle's BIGINT `//` exactly:
      // DuckDB's integer `//` truncates toward zero (measured in the
      // vendored 1.0.0: -41//8 = -5, -48//8 = -6 — the EWMA finding), so
      // Spark's `div` (also truncating) is the faithful twin. The round-12
      // advice asserted `//` floors and a floor-div spelling briefly
      // landed here — that would have diverged for refund-heavy users
      // with NEGATIVE totals, the very case it meant to fix. Truncation
      // on both sides buckets negatives identically; semantically, a
      // -$1.50 user landing in bucket -1 (with -$0.99ers) is as
      // defensible as -2, and cross-engine identity is the contract.
      .withColumn("m_v", expr("m_c div 100"))
      .localCheckpoint() // |users| rows; consumed by three histogram joins
    def quantile(metric: String, out: String): DataFrame = {
      val h = agg.groupBy(metric).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(metric) // histogram-cardinality rows, bounded
      h.withColumn("cum", sum("c").over(w))
        .crossJoin(broadcast(agg.agg(count(lit(1)).as("n"))))
        .select(col(metric),
          expr(s"($buckets * cum + n - 1) div n").as(out)) // exact ⌈·⌉
    }
    agg
      .join(quantile("r_v", "r_q"), "r_v")
      .join(quantile("n_events", "f_q"), "n_events")
      .join(quantile("m_v", "m_q"), "m_v")
      .select("user_id", "last_ts", "n_events", "total_value",
        "r_q", "f_q", "m_q")
  }
}

/** Daily/weekly active users and the DAU/WAU stickiness ratio — the
  * engagement headline of every events dashboard, in a LINEAR shape: a
  * day-d trailing-7 distinct count is not a window over the event stream
  * (distinct-over-range doesn't compose) but an EXPLODE — each (user,
  * active day) row contributes to the 7 WAU days it can influence, then
  * one distinct + one count. 7× row expansion of the |user-days| table,
  * no self-join, no per-day rescan.
  */
object Engagement {

  /** (day, dau, wau, stickiness) per active epoch-day; wau counts users
    * active in [day − 6, day]. Integer epoch-day arithmetic end to end.
    */
  def dauWau(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), graft.functions.TimeOps.epochMs(col("ts")).as("ms"))
      .selectExpr("user_id", "ms div 86400000 AS day")
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau")).as("stickiness"))
  }
}

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

  /** First-order Markov transition matrix over the time-ordered event
    * stream: for every (current, next) event-type pair, the transition
    * count and probability P(next | current). The "what do users do
    * after X" rollup that generalizes the fixed-sequence funnel.
    *
    * Scale shape: one per-USER window (the sessionization bound — a
    * partition is one user's events, never the corpus) pairs each event
    * with its successor via `lead`; everything after is hash aggregates
    * bounded by |event types|². Ties in ts break by event_id, so the
    * successor — and the whole matrix — is deterministic. The normalizer
    * is a window over the aggregated matrix itself (per-`cur` partitions,
    * |event types|-bounded), so the corpus is scanned exactly once.
    */
  /** The (cur → next) adjacency stream the matrix aggregates: one row per
    * consecutive event pair in each user's (ts, event_id)-ordered stream.
    * Factored out so the streaming twin (EventStreams.transitionsEventTime)
    * can prefix-equality-pin against the exact batch pair set.
    */
  def transitionPairs(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead("event_type", 1).over(w))
      .withColumn("nxt_id", lead("event_id", 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("user_id"), col("event_id").as("cur_id"), col("nxt_id"),
        col("event_type").as("cur"), col("nxt"))
  }

  def markov(events: DataFrame): DataFrame = {
    val n = transitionPairs(events).groupBy("cur", "nxt")
      .agg(count(lit(1)).as("n"))
    // Normalizer as a window over the AGGREGATED matrix, not a second
    // aggregate branch: a groupBy("cur") + join-back would re-derive the
    // whole corpus scan→window→agg chain in the static plan (the two
    // exchanges only merge if runtime reuse kicks in). The window's
    // partitions are |event types|-bounded — metadata-sized by contract.
    val w = Window.partitionBy("cur")
    n.select(col("cur"), col("nxt"), col("n"),
      graft.functions.Stable.stab(
        col("n").cast("double") / sum("n").over(w).cast("double"), 6).as("p"))
  }

  /** Stationary distribution of the event-type Markov chain: the long-run
    * fraction of time the stream spends in each event type, by `iters`
    * rounds of power iteration pi' = normalize(pi * P) starting from the
    * uniform distribution over observed states.
    *
    * Determinism contract (the k-means/BPE playbook): every probability is
    * stab(6)-quantized, each iteration's mass products are summed as
    * DECIMAL(28,12) (exact, order-free) and only then divided as doubles,
    * so an oracle that unrolls the same `iters` steps computes the
    * IDENTICAL sequence — the gate is a hash match, not a tolerance.
    * States with no outgoing edges leak mass; the per-step renormalize
    * redistributes it, and states never reached converge to 0 (kept as
    * explicit rows via the left join against the state set).
    *
    * Scale shape: the only corpus-scale work is the transition-count
    * aggregate inside `markov` (per-user lead window + hash agg) — run
    * ONCE. The matrix is |event types|^2-bounded metadata, so it is
    * collected to the driver under the k-means centroid contract
    * (Similarity.kmeansCentroidsPrepared) and the rounds run as plain
    * driver arithmetic over it — zero Spark jobs per round. (Two rejected
    * shapes, both measured: leaving the rounds lazy triples the unrolled
    * plan per round — 3^iters nodes, Catalyst analysis never terminates;
    * materializing each round as a LocalRelation job costs ~0.7 s of
    * scheduler overhead × iters ≈ 16+ s for 5-row data.)
    *
    * The driver arithmetic replicates the SQL expression semantics
    * bit-for-bit so the unrolled DuckDB oracle still hash-matches:
    * `BigDecimal.valueOf(double)` IS Spark's double→DECIMAL cast path
    * (shortest-decimal-string, then HALF_UP to scale 12), BigDecimal adds
    * are the exact order-free decimal sum, `doubleValue` is the correctly
    * rounded DECIMAL→DOUBLE cast, and stab6 is the same floor expression
    * on the same IEEE doubles. The 3-SF hash gates verify the replication.
    */
  def stationary(events: DataFrame, iters: Int = 24): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import java.math.{BigDecimal => JBig, RoundingMode}
    // |event types|^2-bounded metadata (the centroid contract): corpus is
    // scanned exactly once, here.
    val mRows = markov(events).select(col("cur"), col("nxt"), col("p"))
      .as[(String, String, Double)].collect()
    val states = (mRows.map(_._1) ++ mRows.map(_._2)).distinct.sorted
    def stab6(x: Double): Double = graft.functions.Stable.stab6(x)
    val k = states.length.toDouble
    var pi: Map[String, Double] = states.map(s => s -> stab6(1.0 / k)).toMap
    for (_ <- 1 to iters) {
      val mass = scala.collection.mutable.Map.empty[String, JBig]
      for ((cur, nxt, mp) <- mRows) {
        val w = JBig.valueOf(pi(cur) * mp).setScale(12, RoundingMode.HALF_UP)
        mass.update(nxt, mass.getOrElse(nxt, JBig.ZERO).add(w))
      }
      val tot = mass.values.foldLeft(JBig.ZERO)(_.add(_)).doubleValue
      pi = states.map(s =>
        s -> stab6(mass.get(s).fold(0.0)(_.doubleValue) / tot)).toMap
    }
    states.map(s => (s, pi(s))).toSeq.toDF("state", "p")
  }
}

/** Kaplan–Meier survival over the signup→conversion delay — "how long
  * until users convert, honestly accounting for the ones who haven't
  * yet" (right-censoring at the stream's end; naively averaging only
  * converters' delays is the classic survivorship bias). Discrete at
  * DAY granularity.
  *
  * Output per conversion-day step t: the at-risk count n_t (users whose
  * observed time ≥ t), conversions d_t, and the LOG survival
  * ln S(t) = Σ_{t_j ≤ t} ln(1 − d_j/n_j) — emitted as the log, not
  * exp'd: the cumulative sum runs over scale-6 fixed-point longs
  * (exact under any window evaluation tree — the CUSUM lesson), while
  * an exp() per row would reopen the cross-engine libm gap the rational
  * sigmoid closed. Consumers exponentiate client-side.
  *
  * A step with d = n (everyone still at risk converts) can only be the
  * LAST step — a later conversion would contradict n = d — and its
  * ln S = −∞, so that terminal-zero row is dropped (documented, not
  * silently null'd).
  *
  * Shape: two user-keyed min aggregates + one broadcast max, then
  * everything runs over DAY histograms — the at-risk counts come from a
  * descending cumulative over the observed-time histogram, never a
  * per-user inequality join; windows are calendar-bounded.
  */
object Survival {
  import graft.functions.TimeOps

  def kaplanMeier(events: DataFrame, from: String = "signup",
                  to: String = "purchase"): DataFrame = {
    val ms = TimeOps.epochMs(col("ts"))
    val s0 = events.filter(col("event_type") === from)
      .select(col("user_id"), ms.as("ems"))
      .groupBy("user_id").agg(min("ems").as("t0"))
      .localCheckpoint() // reused: conversion join + censor times
    val conv = events.filter(col("event_type") === to)
      .select(col("user_id"), ms.as("ems"))
      .join(s0, "user_id").filter(col("ems") >= col("t0"))
      .groupBy("user_id").agg(min("ems").as("tp"))
    val mx = events.agg(max(ms).as("mxms"))
    val obs = s0.join(conv, Seq("user_id"), "left").crossJoin(broadcast(mx))
      .select(col("user_id"),
        when(col("tp").isNotNull, expr("(tp - t0) div 86400000"))
          .otherwise(expr("(mxms - t0) div 86400000")).as("obs_day"),
        col("tp").isNotNull.as("converted"))
      .localCheckpoint() // reused: at-risk histogram + step counts
    // at-risk n(t) = #users with obs_day >= t, from a DESC cumulative
    // over the |days|-bounded observed-time histogram
    val w = org.apache.spark.sql.expressions.Window
    val hist = obs.groupBy("obs_day").agg(count(lit(1)).as("c"))
    val atRisk = hist.withColumn("n", sum("c").over(w.orderBy(desc("obs_day"))))
      .select(col("obs_day").as("t"), col("n"))
    val steps = obs.filter(col("converted"))
      .groupBy(col("obs_day").as("t")).agg(count(lit(1)).as("d"))
    val term = steps.join(atRisk, "t")
      .filter(col("d") < col("n")) // the only possible d = n step is terminal
      .withColumn("term6",
        floor(log((col("n") - col("d")).cast("double") / col("n").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long"))
    term.withColumn("ln6", sum("term6").over(w.orderBy("t")))
      .select(col("t"), col("n").as("n_at_risk"), col("d").as("n_converted"),
        (col("ln6").cast("double") / lit(1e6)).as("ln_s"))
  }
}
