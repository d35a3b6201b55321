package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for heavy row-local pipelines (optimization
  * round 18; guide §2.5/§6 "input skew — one huge unsplittable file").
  *
  * The test corpora are single-row-group parquet files, and a parquet scan
  * cannot split below a row group — so every expression-heavy row-local
  * stage downstream of `Tables.documents` (WARC blob framing walks, 8-gram
  * posexplodes, HTML block extraction) executed in ONE task regardless of
  * core count (measured: `crawl_dedup_url` ran 3 tasks total on 32 cores,
  * wall 2.9 s ≈ its serial taskTime). One cheap round-robin exchange of
  * the NARROW scan output (ids + text, before the heavy projections)
  * unlocks the full core count for everything downstream.
  *
  * Scale guard: the repartition fires only when the planned scan has fewer
  * partitions than the session's parallelism — at production scale (many
  * splits ≥ cores) this is a no-op and no shuffle is added, so the
  * operator never trades a 100 TB shuffle for local-mode latency. The
  * target count is `defaultParallelism` (cluster-derived), not a constant.
  *
  * Determinism: round-robin repartition sorts within the input partition
  * first (spark.sql.execution.sortBeforeRepartition, on by default) so
  * task retries reproduce the same placement; every consumer here is
  * row-local or key-aggregated, so placement never affects values — and
  * every gated query still ends in its deterministic ORDER BY.
  */
object Spread {
  // USAGE CONTRACT for both helpers: call only on (a) localCheckpoint'd
  // DataFrames (leaf scans — `.rdd` is free) or (b) scan/projection-only
  // plans with no Exchange (planned lazily, not AQE-wrapped). On a plan
  // that contains an exchange, `.rdd.getNumPartitions` under AQE would
  // MATERIALIZE the upstream stages — an accidental eager execution.
  // Enforced by assertNarrow below (round-19: the contract was a comment;
  // a misuse would have silently executed upstream stages instead of
  // failing loudly).
  private def narrowViolations(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.collect {
      // coalesce (Repartition with shuffle=false) is narrow — probing
      // through it is free, and tight() is then idempotent-safe
      case r: Repartition if r.shuffle => r.nodeName
      case r: RepartitionByExpression => r.nodeName
      case n @ (_: Aggregate | _: Join | _: Window | _: Sort |
                _: GlobalLimit | _: Deduplicate |
                _: Except | _: Intersect) => n.nodeName
    }
  }

  private def assertNarrow(df: DataFrame, who: String): Unit = {
    val bad = narrowViolations(df)
    require(bad.isEmpty,
      s"Spread.$who called on a plan containing ${bad.distinct.mkString("/")} — " +
        "only scan/projection-only plans or localCheckpoint leaves are safe " +
        "(.rdd on an exchange-bearing plan under AQE materializes upstream stages)")
  }

  /** The tight() guard as a caller-visible probe: true iff the plan is
    * narrow AND its planned partition count is ≤ `maxParts`. Lets a
    * caller decide once, on the SOURCE scan, whether to take the
    * metadata-scale path (SinglePartition pins + shared-subtree cuts)
    * for frames DERIVED from it — whose own plans carry aggregates and
    * must never be probed directly. A non-narrow input (a caller feeding
    * a pre-shuffled frame, as SearchSpec's order-robustness test does)
    * is NOT an error here — it simply takes the scale path, because
    * probing it would materialize upstream stages.
    */
  def isTiny(df: DataFrame, maxParts: Int = 4): Boolean =
    narrowViolations(df).isEmpty && df.rdd.getNumPartitions <= maxParts

  def apply(df: DataFrame): DataFrame = {
    assertNarrow(df, "apply")
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // planned (not executed) partition count: cheap for the narrow scans
    // this is applied to, and exact where file/split math would guess
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** The INVERSE repair, for iterative driver loops over metadata-scale
    * state (LR feature rounds, label propagation, k-means): a 1-partition
    * input planned as `UnknownPartitioning(1)` still draws an Exchange
    * before every join/aggregate (EnsureRequirements only trusts
    * `SinglePartition`), so each loop round materializes 2+ AQE stage
    * jobs of scheduler latency for microseconds of compute (measured:
    * text_quality_lr_model ran 54 jobs for 0.27 s of summed task time).
    * `coalesce(1)` is a zero-cost metadata wrapper whose CoalesceExec
    * DOES advertise SinglePartition — every downstream join/aggregate
    * over it plans exchange-free, one stage per round.
    *
    * Scale guard: only collapses inputs that are ALREADY ≤ `maxParts`
    * partitions (post-AQE-coalesce checkpoints, single-split scans). A
    * production-scale table keeps its partitioning and its shuffles.
    */
  def tight(df: DataFrame, maxParts: Int = 4): DataFrame = {
    assertNarrow(df, "tight")
    if (df.rdd.getNumPartitions <= maxParts) df.coalesce(1) else df
  }
}
