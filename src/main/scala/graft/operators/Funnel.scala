package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TimeOps

/** Strict-order funnel analysis — the sequential-pattern operator event
  * pipelines run on clickstreams: how many users performed step 1, then
  * step 2 strictly after it, then step 3 after that, …
  *
  * Semantics: per user, step k's timestamp is the EARLIEST event of step
  * k's type strictly after the user's step k−1 timestamp (first-touch
  * attribution). A user reaches stage k iff that chain is non-empty
  * through k.
  *
  * Scale shape: each step is one filtered scan equi-joined to the prior
  * stage's (user_id, t) table — aggregate-sized and strictly shrinking,
  * so later joins broadcast — followed by a user-keyed min aggregate
  * (partials map-side). No window over the event stream (a ts-ordered
  * window per user would sort the whole corpus); no driver round-trips;
  * the result is one tiny union of per-stage counts.
  */
object Funnel {

  /** Step-k join condition: strictly after step k−1's first touch, and —
    * when a conversion horizon is set — no later than `within` after it.
    * Unbounded funnels admit a step-k event years after step k−1; real
    * funnel queries bound each transition (an INTERVAL Column, e.g.
    * `expr("INTERVAL 24 HOURS")`). The bound composes per step, so the
    * whole funnel is implicitly bounded by (s−1)·within.
    */
  private def stepCond(within: Option[Column]): Column = {
    val after = col("e.ts") > col("c.t")
    within.fold(after)(w => after && col("e.ts") <= col("c.t") + w)
  }

  /** Per-stage conversion counts for `steps` (event_type values, in funnel
    * order). Returns (stage INT 1-based, step STRING, n_users BIGINT).
    * `within` bounds each step transition (None = unbounded, the classic
    * form).
    */
  def conversion(events: DataFrame, steps: Seq[String],
                 within: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // Each stage table feeds TWO consumers — the next stage's join and its
    // own count — so without a cut the count of stage k re-executes the
    // whole filter+join+agg chain for stages 1..k: O(s²) scans of the
    // events table for an s-step funnel. localCheckpoint materializes each
    // stage (aggregate-sized: one row per surviving user) so every stage's
    // scan+join runs exactly once; semantics unchanged.
    var cur = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
      .localCheckpoint()
    val stageTables = Vector.newBuilder[(Int, String, DataFrame)]
    stageTables += ((1, steps.head, cur))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      val nxt = events.filter(col("event_type") === st).as("e")
        .join(cur.as("c"),
          col("e.user_id") === col("c.user_id") && stepCond(within))
        .groupBy(col("e.user_id").as("user_id")).agg(min(col("e.ts")).as("t"))
        .localCheckpoint()
      stageTables += ((i + 2, st, nxt))
      cur = nxt
    }
    stageTables.result().map { case (i, name, df) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage"), lit(name).as("step"), col("n_users"))
    }.reduce(_.unionAll(_)).orderBy("stage")
  }

  /** Per-transition conversion rate with a Wilson score interval
    * (Wilson 1927) — the uncertainty band a growth dashboard needs
    * before reading a small funnel step as a real change (a plain ±z√pq/n
    * Wald band collapses/explodes near p = 0 or 1; Wilson stays inside
    * [0, 1]). Output per transition k→k+1: (stage, step, next_step, n,
    * n_next, rate, lo, hi), stab(6)'d doubles.
    *
    * Determinism: every term is add/mul/div/sqrt of correctly-rounded
    * IEEE ops mirrored textually in the oracle; z² is computed once
    * DRIVER-side and inlined via shortest-decimal string on both sides —
    * DuckDB would otherwise evaluate 1.96*1.96 in exact DECIMAL, one ulp
    * off the double product. The stats ride the stage-count table
    * (|steps| rows), so this is metadata arithmetic on top of
    * `conversion`'s one pass per stage.
    */
  def conversionCi(events: DataFrame, steps: Seq[String],
                   z: Double = 1.96): DataFrame = {
    import graft.functions.Stable
    val zz = z * z
    val conv = conversion(events, steps).localCheckpoint() // |steps| rows
    val nxt = conv.select((col("stage") - 1).as("stage"),
      col("step").as("next_step"), col("n_users").as("n_next"))
    val j = conv.join(nxt, "stage")
      .select(col("stage"), col("step"), col("next_step"),
        col("n_users").as("n"), col("n_next"))
      .filter(col("n") > 0)
    val nD = col("n").cast("double")
    val ph = col("n_next").cast("double") / nD
    val den = lit(1.0) + lit(zz) / nD
    val ctr = ph + lit(zz) / (lit(2.0) * nD)
    val rad = lit(z) * sqrt(ph * (lit(1.0) - ph) / nD + lit(zz) / ((lit(4.0) * nD) * nD))
    j.select(col("stage"), col("step"), col("next_step"), col("n"), col("n_next"),
        Stable.stab(ph, 6).as("rate"),
        Stable.stab((ctr - rad) / den, 6).as("lo"),
        Stable.stab((ctr + rad) / den, 6).as("hi"))
  }

  /** The users who completed the whole funnel, with each stage's
    * first-touch timestamp of the FINAL step — the cohort extraction twin
    * of `conversion`. Returns (user_id, t_last).
    */
  /** Per-transition conversion timing: for each stage k ≥ 2, how long the
    * users who reached it took from their stage-(k−1) first touch. All
    * integer milliseconds (sum/avg/max of BIGINTs — exact, hash-stable
    * cross-engine; avg is integral `div`, Spark's long division twin of
    * DuckDB's `//`, so exactness holds past 2^53 where a double-division
    * floor() would start rounding). Returns (stage, step, n_users,
    * avg_ms, max_ms). Same shrinking-equi-join shape as `conversion`,
    * one extra epoch-diff column per stage.
    */
  def conversionTiming(events: DataFrame, steps: Seq[String],
                       within: Option[Column] = None): DataFrame = {
    require(steps.length >= 2, "timing needs at least two steps")
    var cur = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
      .localCheckpoint() // one scan per stage (see conversion)
    val stages = Vector.newBuilder[DataFrame]
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      val nxt = events.filter(col("event_type") === st).as("e")
        .join(cur.as("c"),
          col("e.user_id") === col("c.user_id") && stepCond(within))
        .groupBy(col("e.user_id").as("user_id"))
        // carry the previous stage's first touch alongside this stage's:
        // c.t is unique per user (grouped), so min() just passes it through
        .agg(min(col("e.ts")).as("t"), min(col("c.t")).as("t_prev"))
        .localCheckpoint()
      val delta = TimeOps.epochMs(col("t")) - TimeOps.epochMs(col("t_prev"))
      stages += nxt.agg(count(lit(1)).as("n_users"),
          sum(delta).as("sum_ms"), max(delta).as("max_ms"))
        // `div` is long÷long integral division — deltas are non-negative,
        // so this is the floor(sum/n) the doc promises, with no double
        // round-trip anywhere
        .select(lit(i + 2).as("stage"), lit(st).as("step"), col("n_users"),
          expr("sum_ms div n_users").as("avg_ms"), col("max_ms"))
      cur = nxt.select("user_id", "t")
    }
    stages.result().reduce(_.unionAll(_)).orderBy("stage")
  }

  def completedUsers(events: DataFrame, steps: Seq[String],
                     within: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    steps.tail.foreach { st =>
      cur = events.filter(col("event_type") === st).as("e")
        .join(cur.as("c"),
          col("e.user_id") === col("c.user_id") && stepCond(within))
        .groupBy(col("e.user_id").as("user_id")).agg(min(col("e.ts")).as("t"))
    }
    cur.select(col("user_id"), col("t").as("t_last"))
  }
}
