package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** One-sided CUSUM drift detection over per-type DAILY event counts
    * (Page 1954) — the classic "volume shifted upward" monitor a
    * pipeline runs on its ingest rates. The textbook recursion
    * S_t = max(0, S_{t−1} + (x_t − μ − k·σ)) is not a plain window
    * function, but it has the exact prefix closed form
    *
    *   S_t = P_t − min(0, min_{j≤t} P_j),   P_t = Σ_{i≤t} d_i
    *
    * (P₀ = 0), which IS two ordered windows — a running sum and a
    * running min. Flag when S_t > h·σ.
    *
    * Determinism: the drift term d_t is quantized to a scale-6
    * fixed-point LONG before the windows, so the running sum is exact
    * integer arithmetic under ANY evaluation tree — this matters
    * because DuckDB computes window aggregates over segment trees, not
    * left folds, and a double running sum could differ in the last ulp
    * from Spark's streaming frame. μ and σ come from exact integer
    * moment sums (one division / one sqrt, identical ops both engines).
    *
    * Shape: a daily hash aggregate, a |types|-row moment rollup
    * broadcast back, and two windows whose partitions are per-type DAY
    * series — bounded by the calendar, never by corpus size.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))

  /** Day-of-week seasonality profile per event type: the mean daily
    * count by ISO weekday against the type's overall mean — the
    * multiplicative index a monitor divides out BEFORE running
    * CUSUM/EWMA on a weekly-patterned series (without it, every Sunday
    * fires a dip alarm). All arithmetic is exact-integer sums with
    * single IEEE divisions, so the doubles are engine-identical with no
    * stabilizer. Output is calendar-bounded (|types|×7), the aggregates
    * are one daily hash agg + one 7-way rollup.
    */
  def seasonality(events: DataFrame): DataFrame =
    seasonalityFrom(dailyCounts(events))

  /** [[seasonality]] over an already-aggregated (event_type, day, x)
    * series — the calibration-window entry point the streaming monitor's
    * offline half uses.
    */
  def seasonalityFrom(daily0: DataFrame): DataFrame = {
    val daily = daily0
      .withColumn("dow", ((dayofweek(col("day")) + lit(5)) % 7 + lit(1)).cast("int"))
    val perDow = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"), sum("x").as("sx"))
    val overall = daily.groupBy("event_type")
      .agg(count(lit(1)).as("ndg"), sum("x").as("sg"))
    perDow.join(overall, "event_type")
      .select(col("event_type"), col("dow"), col("n_days"),
        (col("sx").cast("double") / col("n_days")).as("mean_count"),
        ((col("sx").cast("double") / col("n_days")) /
          (col("sg").cast("double") / col("ndg"))).as("dow_index"))
  }

  /** Per-type (μ, σ) calibration from exact integer moments over the
    * daily series — the offline step of a production CUSUM monitor.
    */
  def cusumBaseline(daily: DataFrame): DataFrame =
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum("x").as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("nd")).as("mu"),
        sqrt(greatest(
          col("s2").cast("double") / col("nd") -
            (col("s1").cast("double") / col("nd")) * (col("s1").cast("double") / col("nd")),
          lit(0.0))).as("sig"))

  /** The fixed-point drift term floor(((x−μ) − k·σ)·10⁶ + 0.5) — shared
    * verbatim by the batch windows and the streaming fold, so their
    * parity is by construction.
    */
  def driftQ(x: Column, mu: Column, sig: Column, k: Double): Column =
    floor(((x.cast("double") - mu) - lit(k) * sig) * lit(1e6) + lit(0.5)).cast("long")

  /** CUSUM over an already-calibrated baseline — the online half; the
    * streaming twin (EventStreams.cusumStream) folds the same recursion
    * over the same drift terms.
    */
  def cusumFrom(daily: DataFrame, base: DataFrame,
                k: Double = 0.5, h: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
    daily.join(broadcast(base), "event_type")
      .withColumn("dq", driftQ(col("x"), col("mu"), col("sig"), k))
      .withColumn("p", sum("dq").over(w))
      .withColumn("m", least(lit(0L), min("p").over(w)))
      .select(col("event_type"), col("day"), col("x"),
        ((col("p") - col("m")).cast("double") / lit(1e6)).as("cusum"),
        (((col("p") - col("m")).cast("double") / lit(1e6)) > lit(h) * col("sig")).as("flag"))
  }

  def cusum(events: DataFrame, k: Double = 0.5, h: Double = 4.0): DataFrame = {
    val daily = dailyCounts(events).localCheckpoint() // reused: baseline + windows
    cusumFrom(daily, cusumBaseline(daily), k, h)
  }

  /** CUSUM over DESEASONALIZED daily counts — the [[seasonality]]
    * profile in action: each day's count divides by its weekday index
    * before calibration and monitoring, so a weekly-patterned series
    * stops firing a dip alarm every quiet Sunday and a genuine drift is
    * no longer hidden inside the weekly swing.
    *
    * Exactness: the adjusted count is quantized to micro-units ONCE
    * (floor(x/idx·10⁶ + 0.5) — one deterministic IEEE division on exact
    * integers), and every downstream moment runs on those longs: s1 is
    * an exact long sum, s2 an exact DECIMAL(38,0) sum (the botScore
    * carrier — micro-unit squares pass int64), μ/σ come off them with
    * a fixed division chain, and the drift recursion is the same
    * prefix-min closed form as [[cusumFrom]]. Same shape: two hash
    * aggregates + two calendar-bounded windows.
    */
  /** Weekday-adjusted daily series against a seasonality profile:
    * xq = floor(x/idx·10⁶ + 0.5) — micro-unit longs, quantized ONCE.
    * A day whose (type, weekday) has no profile row FAILS LOUDLY
    * (raise_error), matching the streaming twin's contract — an inner
    * join would silently drop the day from the monitor, which for a
    * drift detector is the worst possible failure mode (self-review
    * finding, round 14).
    */
  def deseasonalAdjusted(daily: DataFrame, idx: DataFrame): DataFrame =
    daily
      .withColumn("dow", ((dayofweek(col("day")) + lit(5)) % 7 + lit(1)).cast("int"))
      .join(broadcast(idx), Seq("event_type", "dow"), "left")
      .withColumn("dow_index",
        when(col("dow_index").isNull, raise_error(concat(
          lit("no seasonality profile for ("), col("event_type"),
          lit(", "), col("dow").cast("string"), lit(")"))))
          .otherwise(col("dow_index")))
      .withColumn("xq",
        floor(col("x").cast("double") / col("dow_index") * lit(1e6) + lit(0.5)).cast("long"))

  /** (μ, σ) calibration over the micro-unit adjusted series — exact long
    * s1, exact DECIMAL(38,0) s2 (the botScore carrier), fixed division
    * chain back to unit scale.
    */
  def deseasonalBaseline(adj: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    adj.groupBy("event_type").agg(
        count(lit(1)).as("nd"), sum("xq").as("s1"),
        sum(col("xq").cast(d38) * col("xq").cast(d38)).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("nd") / lit(1e6)).as("mu"),
        sqrt(greatest(
          col("s2").cast("double") / col("nd") / lit(1e12) -
            (col("s1").cast("double") / col("nd") / lit(1e6)) *
              (col("s1").cast("double") / col("nd") / lit(1e6)),
          lit(0.0))).as("sig"))
  }

  /** The monitor half over an adjusted+calibrated series — the batch
    * twin EventStreams.cusumDeseasonalStream folds online.
    */
  def cusumDeseasonalFrom(adj: DataFrame, base: DataFrame,
                          k: Double = 0.5, h: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
    adj.join(broadcast(base), "event_type")
      .withColumn("xa", col("xq").cast("double") / lit(1e6))
      .withColumn("dq", driftQ(col("xa"), col("mu"), col("sig"), k))
      .withColumn("p", sum("dq").over(w))
      .withColumn("m", least(lit(0L), min("p").over(w)))
      .select(col("event_type"), col("day"), col("x"), col("xa").as("x_adj"),
        ((col("p") - col("m")).cast("double") / lit(1e6)).as("cusum"),
        (((col("p") - col("m")).cast("double") / lit(1e6)) > lit(h) * col("sig")).as("flag"))
  }

  def cusumDeseasonal(events: DataFrame,
                      k: Double = 0.5, h: Double = 4.0): DataFrame = {
    val daily = dailyCounts(events).localCheckpoint()
    // profile from the SAME checkpointed daily frame — the corpus-scale
    // scan+aggregate runs once, not once per consumer
    val idx = seasonalityFrom(daily).select("event_type", "dow", "dow_index")
    val adj = deseasonalAdjusted(daily, idx)
    cusumDeseasonalFrom(adj, deseasonalBaseline(adj), k, h)
  }

  /** Per-user inter-event-gap regularity — the classic bot signal
    * (machine traffic fires on a clock; human gaps are bursty). Scored
    * as the coefficient of variation over the user's gap sequence,
    *
    *   cv = σ/μ = √(n·S₂ − S₁²) / S₁
    *
    * with S₁ = Σ gap, S₂ = Σ gap² in exact DECIMAL(38,0) integers (the
    * sigmaOutliers carrier: ms gaps square past int64 at production
    * spans; n·S₂ ≥ S₁² exactly by Cauchy–Schwarz, so the radicand is
    * never negative). One sqrt + one division on correctly-rounded
    * doubles (VARCHAR-hop DECIMAL→DOUBLE in the twin), stab(6)'d;
    * `is_regular` flags cv < cvMax. Users need ≥ 2 gaps. Shape: one
    * per-user lag window + one moment aggregate — the sessionize scan.
    */
  def botScore(events: DataFrame, cvMax: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ms = graft.functions.TimeOps.epochMs(col("ts"))
    val gaps = events
      .select(col("user_id"), (ms - lag(ms, 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
    val d38 = DecimalType(38, 0)
    val st = gaps.groupBy("user_id").agg(
        count(lit(1)).as("n_gaps"),
        sum(col("gap").cast(d38)).as("s1"),
        sum(col("gap").cast(d38) * col("gap").cast(d38)).as("s2"))
      .filter(col("n_gaps") >= 2)
    val cv = graft.functions.Stable.stab(
      sqrt((col("n_gaps").cast(d38) * col("s2") - col("s1") * col("s1")).cast("double"))
        / col("s1").cast("double"), 6)
    st.select(col("user_id"), col("n_gaps"), cv.as("cv"))
      .select(col("user_id"), col("n_gaps"), col("cv"),
        (col("cv") < lit(cvMax)).as("is_regular"))
  }

  /** EWMA smoothing of the per-type daily counts — the forecast baseline
    * of a rate monitor (CUSUM answers "has the level shifted"; EWMA
    * answers "what did we expect today", and dev = today − expectation
    * is the residual an alert thresholds). α = 1/alphaDen with the
    * recursion run ENTIRELY in scale-6 fixed-point int64,
    *
    *   s₁ = 10⁶·x₁,   s_t = s_{t−1} + trunc((10⁶·x_t − s_{t−1}) / alphaDen)
    *
    * — TRUNCATING division on both sides (JVM long `/` here, DuckDB's
    * BIGINT `//` in the twin; measured: −41//8 = −5, i.e. toward zero —
    * floorDiv would drift one fixed-point unit on negative residuals),
    * so every step is exact integer arithmetic and the oracle's
    * RECURSIVE CTE reproduces the sequence bit-for-bit. A true EWMA
    * recursion is not window-expressible (unlike CUSUM it has no prefix
    * closed form — the weights decay geometrically), so this runs as
    * driver arithmetic over the collected daily series: |types|×days
    * rows, calendar-bounded metadata regardless of corpus scale (the
    * events_stationary contract). The corpus-scale work is only the
    * daily hash aggregate.
    */
  def ewma(events: DataFrame, alphaDen: Long = 8L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val rows = dailyCounts(events)
      .select(col("event_type"), col("day"), col("x"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2.getTime))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, java.sql.Timestamp, Long, Double, Double)]
    var curType: String = null
    var s = 0L
    for ((tpe, day, x) <- rows) {
      val x6 = x * 1000000L
      if (tpe != curType) {
        curType = tpe
        s = x6
        out += ((tpe, day, x, s.toDouble / 1e6, 0.0))
      } else {
        val dev6 = x6 - s
        s = s + dev6 / alphaDen // truncating, = DuckDB BIGINT //
        out += ((tpe, day, x, s.toDouble / 1e6, dev6.toDouble / 1e6))
      }
    }
    out.toSeq.toDF("event_type", "day", "x", "ewma", "dev")
  }

  /** EWMA forecast backtest card: `dev` IS the one-step-ahead error
    * (x_t − ewma_{t−1}), so the baseline's forecast quality rolls up
    * from the recursion the gate already pins — per type, MAE (how far
    * off) and bias (systematically high/low — nonzero means the series
    * trends faster than α tracks). The first day of each series is
    * excluded (dev=0 is definitional, not a forecast). Micro-unit longs
    * sum exactly; one fixed division chain to unit scale.
    */
  def ewmaBacktest(events: DataFrame, alphaDen: Long = 8L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
    ewma(events, alphaDen)
      .withColumn("rn", row_number().over(w)).filter(col("rn") >= 2)
      .withColumn("dev6", floor(col("dev") * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n_days"),
        sum(abs(col("dev6"))).as("sa"), sum(col("dev6")).as("sb"))
      .select(col("event_type"), col("n_days"),
        (col("sa").cast("double") / col("n_days") / lit(1e6)).as("mae"),
        (col("sb").cast("double") / col("n_days") / lit(1e6)).as("bias"))
  }
}
