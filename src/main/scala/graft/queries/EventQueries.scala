package graft.queries

import graft.GraftQuery
import graft.functions.Stable.{dsum, dsumSql}
import graft.operators.{AsOf, Sessionize}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Batch queries over the `events` stream table. These are the *batch twins*
  * of the Structured Streaming pipelines in graft.streaming.EventStreams —
  * same grouping logic, verifiable against DuckDB; the streaming variants
  * (watermarks, append mode, stateful sessionization) are exercised in
  * StreamingSpec where a memory sink replaces the oracle.
  */
object EventQueries {

  /** The raw parquet is TIMESTAMP_NS in DuckDB; cast to microsecond
    * TIMESTAMP to mirror the Spark-side nanos→micros truncation
    * (Tables.events).
    */
  val evCte: String =
    """ev AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
      |  FROM events)""".stripMargin

  /** Unrolled power-iteration oracle for `events_stationary`: the same
    * fixed `iters` rounds as Paths.stationary, every probability stab(6)'d,
    * every mass sum in DECIMAL(28,12) so the sequence is order-free and
    * bit-identical across engines (all divisions happen in DOUBLE on both
    * sides — DuckDB literals are DECIMAL, hence the explicit casts).
    * Every step CTE is MATERIALIZED: DuckDB inlines plain CTEs, and since
    * step i references step i-1 twice (the mass join and the renormalizer
    * subquery) inlining doubles the expression tree per step — 2^iters
    * parquet scans (the same blowup the operator avoids with its per-round
    * LocalRelation collect).
    */
  private def stationaryOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      s"""w$i AS MATERIALIZED (
         |  SELECT m.nxt AS state, sum(CAST($prev.p * m.p AS DECIMAL(28,12))) AS w
         |  FROM $prev JOIN m ON $prev.state = m.cur GROUP BY 1),
         |p$i AS MATERIALIZED (
         |  SELECT st.state,
         |    floor(CAST(COALESCE(w$i.w, 0) AS DOUBLE)
         |          / CAST((SELECT sum(w) FROM w$i) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS p
         |  FROM st LEFT JOIN w$i USING (state))""".stripMargin
    }.mkString(",\n")
    s"""WITH $evCte,
       |pr AS (
       |  SELECT event_type AS cur,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
       |  FROM ev),
       |n AS (
       |  SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
       |  FROM pr WHERE nxt IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS tot FROM n GROUP BY cur),
       |m AS MATERIALIZED (
       |  SELECT n.cur, n.nxt,
       |    floor(CAST(n.n AS DOUBLE) / CAST(t.tot AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS p
       |  FROM n JOIN t USING (cur)),
       |st AS MATERIALIZED (SELECT cur AS state FROM m UNION SELECT nxt AS state FROM m),
       |p0 AS MATERIALIZED (
       |  SELECT state,
       |    floor(CAST(1.0 AS DOUBLE) / CAST((SELECT count(*) FROM st) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS p
       |  FROM st),
       |$steps
       |SELECT state, p FROM p$iters ORDER BY state""".stripMargin
  }

  def all: Seq[GraftQuery] = Seq(

    // Tumbling 1-hour event-time window aggregate.
    GraftQuery("events_hourly",
      (s, d) => Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type"),
      Some(
        s"""WITH $evCte
           |SELECT date_trunc('hour', ts) AS hour, event_type,
           |  count(*) AS n, ${dsumSql("value")} AS sum_value
           |FROM ev GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // Gap-based sessionization (30-min inactivity gap): classic
    // lag → boundary flag → running-sum session id.
    GraftQuery("events_sessionize",
      (s, d) => Sessionize.sessions(Tables.events(s, d), gapMinutes = 30)
        .orderBy("user_id", "session_id"),
      Some(
        s"""WITH $evCte,
          |e AS (
          |  SELECT user_id, ts, event_id,
          |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
          |           (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000
          |         THEN 0 ELSE 1 END AS new_s
          |  FROM ev),
          |s AS (
          |  SELECT user_id, ts,
          |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
          |  FROM e)
          |SELECT user_id, session_id, count(*) AS n_events,
          |  min(ts) AS session_start, max(ts) AS session_end
          |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)),

    // Per-user behavioral rollup (stream-style keyed state, batch twin).
    GraftQuery("events_user_stats",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("event_type").as("n_types"),
          dsum(col("value"), 2).as("sum_value"),
          min("ts").as("first_ts"), max("ts").as("last_ts"))
        .orderBy("user_id"),
      Some(
        s"""WITH $evCte
           |SELECT user_id, count(*) AS n_events, count(DISTINCT event_type) AS n_types,
           |  ${dsumSql("value")} AS sum_value, min(ts) AS first_ts, max(ts) AS last_ts
           |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Per-user 3σ outliers with an all-integer decision rule:
    // (n·x − S₁)² > 9·(n·S₂ − S₁²) over exact cent moments — no mean,
    // no stddev, no sqrt, no doubles, so the flagged set is identical
    // under any aggregation order and in any engine. One moment pass
    // (three DECIMAL(38,0) moments per user — int64 would wrap at
    // production magnitudes; the oracle mirrors with HUGEINT casts)
    // broadcast back for the row-local test.
    GraftQuery("events_anomaly",
      (s, d) => graft.operators.Anomaly.sigmaOutliers(Tables.events(s, d), 3)
        .orderBy("event_id"),
      Some(
        s"""WITH $evCte,
           |evc AS (
           |  SELECT event_id, user_id, value,
           |    CAST(round(value * 100) AS BIGINT) AS c FROM ev),
           |st AS (
           |  SELECT user_id, CAST(count(*) AS HUGEINT) AS n, sum(c) AS s1,
           |    sum(CAST(c AS HUGEINT) * c) AS s2
           |  FROM evc GROUP BY user_id)
           |SELECT event_id, user_id, value
           |FROM evc JOIN st USING (user_id)
           |WHERE (n * c - s1) * (n * c - s1) > 9 * (n * s2 - s1 * s1)
           |ORDER BY event_id""".stripMargin)),

    // Recency-weighted user value: each event's contribution halves
    // every 7 days of age relative to the stream's own max timestamp
    // (taken in-plan — the result is a pure function of the input).
    // The freshness feature of ranking/abuse models, hash-gated: exact
    // integer ages, one pow per row under stab(6), decimal sums.
    GraftQuery("events_decay",
      (s, d) => graft.operators.Decay
        .decayedUserValue(Tables.events(s, d), 604800000L)
        .orderBy("user_id"),
      Some(
        s"""WITH $evCte,
           |e2 AS (SELECT user_id, value, epoch_ms(ts) AS es FROM ev),
           |mx AS (SELECT max(es) AS now FROM e2),
           |sc AS (
           |  SELECT user_id,
           |    floor(value * pow(0.5, CAST((SELECT now FROM mx) - es AS DOUBLE)
           |      / 604800000.0) * 1000000.0 + 0.5) / 1000000.0 AS dv
           |  FROM e2)
           |SELECT user_id, count(*) AS n_events,
           |  floor(CAST(sum(CAST(dv AS DECIMAL(18,6))) AS DOUBLE) * 1000000.0 + 0.5)
           |    / 1000000.0 AS decayed
           |FROM sc GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // JSON scalar extraction from the props column.
    GraftQuery("events_json_props",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"),
      Some(
        """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |FROM events ORDER BY event_id""".stripMargin)),

    slidingWindow,

    // Spark's built-in session_window in batch mode: same 30-min-gap
    // islands as events_sessionize, but windows come from the native
    // operator (w_end = last event + gap). Oracle re-derives the islands.
    GraftQuery("events_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("w_start"),
          col("w.end").as("w_end"), col("n_events"))
        .orderBy("user_id", "w_start"),
      Some(
        s"""WITH $evCte,
           |e AS (
           |  SELECT user_id, ts,
           |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
           |           (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000
           |         THEN 0 ELSE 1 END AS new_s
           |  FROM ev),
           |s AS (
           |  SELECT user_id, ts,
           |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
           |  FROM e)
           |SELECT user_id, min(ts) AS w_start,
           |  max(ts) + INTERVAL 30 MINUTE AS w_end, count(*) AS n_events
           |FROM s GROUP BY user_id, sid ORDER BY user_id, w_start""".stripMargin)),

    // Range (non-equi) join: band each event's value against a tiny tier
    // table — broadcast nested-loop on value >= lo AND value < hi. The
    // broadcast keeps a theta-join linear; at scale the alternative is
    // binning both sides to an equi-key first.
    GraftQuery("events_range_join",
      (s, d) => {
        import s.implicits._
        val tiers = Seq(("low", 0.0, 5.0), ("mid", 5.0, 15.0), ("high", 15.0, 1e9))
          .toDF("tier", "lo", "hi")
        Tables.events(s, d)
          .join(broadcast(tiers), col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy("tier")
          .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
          .orderBy("tier")
      },
      Some(
        s"""WITH $evCte,
           |tiers(tier, lo, hi) AS (VALUES ('low', 0.0, 5.0), ('mid', 5.0, 15.0), ('high', 15.0, 1e9))
           |SELECT tier, count(*) AS n, ${dsumSql("value")} AS sum_value
           |FROM ev JOIN tiers ON value >= lo AND value < hi
           |GROUP BY tier ORDER BY tier""".stripMargin)),

    // Backward as-of join (AsOf.joinBackward): attribute each purchase to
    // the user's most recent view at-or-before it. Oracle uses DuckDB's
    // native ASOF LEFT JOIN — same backward/left-outer semantics.
    GraftQuery("events_asof_attrib",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"),
            col("event_id").as("view_event_id"), col("value").as("view_value"))
        AsOf.joinBackward(purchases, views, "user_id", "ts", "view_event_id")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("_asof.view_event_id").as("view_event_id"),
            col("_asof.view_value").as("view_value"))
          .orderBy("event_id")
      },
      Some(
        s"""WITH $evCte,
           |p AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase'),
           |v AS (SELECT user_id, ts, event_id AS view_event_id, value AS view_value
           |      FROM ev WHERE event_type = 'view')
           |SELECT p.event_id, p.user_id, p.ts, v.view_event_id, v.view_value
           |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
           |ORDER BY p.event_id""".stripMargin)),

    // Strict-order funnel (signup → view → click → purchase): per-stage
    // user counts where each stage's first touch is strictly after the
    // previous stage's. Each step is a filtered-scan equi-join to the
    // shrinking prior stage + a user-keyed min — no ts-ordered window
    // over the corpus (graft.operators.Funnel).
    GraftQuery("events_funnel",
      (s, d) => graft.operators.Funnel.conversion(Tables.events(s, d),
        Seq("signup", "view", "click", "purchase")),
      Some(
        s"""WITH $evCte,
           |s1 AS (SELECT user_id, min(ts) AS t FROM ev WHERE event_type = 'signup' GROUP BY 1),
           |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
           |       WHERE e.event_type = 'view' GROUP BY 1),
           |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
           |       WHERE e.event_type = 'click' GROUP BY 1),
           |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
           |       WHERE e.event_type = 'purchase' GROUP BY 1)
           |SELECT 1 AS stage, 'signup' AS step, count(*) AS n_users FROM s1
           |UNION ALL SELECT 2, 'view', count(*) FROM s2
           |UNION ALL SELECT 3, 'click', count(*) FROM s3
           |UNION ALL SELECT 4, 'purchase', count(*) FROM s4
           |ORDER BY stage""".stripMargin)),

    // Per-transition funnel conversion with a Wilson 95% score interval
    // (Funnel.conversionCi) — z² inlined driver-side on both engines
    // (DuckDB's DECIMAL 1.96*1.96 is an ulp off the double product).
    GraftQuery("events_funnel_ci",
      (s, d) => graft.operators.Funnel.conversionCi(Tables.events(s, d),
          Seq("signup", "view", "click", "purchase"))
        .orderBy("stage"),
      Some {
        val z = 1.96
        // VARCHAR→DOUBLE (strtod, single-step correctly rounded): the bare
        // 17-digit decimal literal parses as DECIMAL(17,16) whose int repr
        // exceeds 2^53, and DuckDB's direct DECIMAL→DOUBLE double-rounds
        // one ulp above Spark's lit(1.96*1.96) — verified in the closing
        // self-review against the vendored DuckDB 1.0.0
        val zz = s"CAST('${z * z}' AS DOUBLE)"
        val nD = "CAST(a.n AS DOUBLE)"
        val ph = s"(CAST(b.n AS DOUBLE) / $nD)"
        val den = s"(1.0 + $zz / $nD)"
        val ctr = s"($ph + $zz / (2.0 * $nD))"
        val rad = s"($z * sqrt($ph * (1.0 - $ph) / $nD + $zz / ((4.0 * $nD) * $nD)))"
        def s6(x: String) = graft.functions.Stable.stabSql(x, 6)
        s"""WITH $evCte,
           |s1 AS (SELECT user_id, min(ts) AS t FROM ev WHERE event_type = 'signup' GROUP BY 1),
           |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
           |       WHERE e.event_type = 'view' GROUP BY 1),
           |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
           |       WHERE e.event_type = 'click' GROUP BY 1),
           |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
           |       WHERE e.event_type = 'purchase' GROUP BY 1),
           |c AS (SELECT 1 AS stage, 'signup' AS step, count(*) AS n FROM s1
           |      UNION ALL SELECT 2, 'view', count(*) FROM s2
           |      UNION ALL SELECT 3, 'click', count(*) FROM s3
           |      UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
           |SELECT a.stage, a.step, b.step AS next_step,
           |  a.n, b.n AS n_next,
           |  ${s6(ph)} AS rate,
           |  ${s6(s"($ctr - $rad) / $den")} AS lo,
           |  ${s6(s"($ctr + $rad) / $den")} AS hi
           |FROM c a JOIN c b ON b.stage = a.stage + 1
           |WHERE a.n > 0
           |ORDER BY a.stage""".stripMargin
      }),

    // Cohort retention matrix: users bucketed by first-event day, distinct
    // actives per (cohort, day offset ≤ 7). One user-keyed min + equi-join
    // + distinct + count — no window over the event corpus
    // (graft.operators.Retention).
    // DAU/WAU + stickiness, in the linear shape: the trailing-7 distinct
    // is an EXPLODE (each user-day contributes to the 7 WAU days it can
    // influence) + distinct + count — no per-day rescan, no range window.
    GraftQuery("events_dau_wau",
      (s, d) => graft.operators.Engagement.dauWau(Tables.events(s, d))
        .orderBy("day"),
      Some(
        s"""WITH $evCte,
           |ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM ev),
           |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
           |wau AS (
           |  SELECT day, count(*) AS wau FROM (
           |    SELECT DISTINCT user_id, day + o AS day
           |    FROM ud, unnest(range(0, 7)) t(o))
           |  GROUP BY day)
           |SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           |  CAST(d.dau AS DOUBLE) / w.wau AS stickiness
           |FROM dau d JOIN wau w USING (day) ORDER BY d.day""".stripMargin)),

    // RFM user segmentation in the scalable-exact quantile form: each
    // metric's quintile comes from its cumulative histogram
    // (q = ⌈5·cum/n⌉, ties share a bucket) — never an unpartitioned
    // ntile over the user table. Three bounded histogram windows +
    // three equi-joins back.
    GraftQuery("events_rfm",
      (s, d) => graft.operators.Rfm.segments(Tables.events(s, d))
        .orderBy("user_id"),
      Some(
        s"""WITH $evCte,
           |agg AS (
           |  SELECT user_id, max(ts) AS last_ts, count(*) AS n_events,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
           |  FROM ev GROUP BY user_id),
           |a2 AS (SELECT *, epoch_ms(last_ts) // 86400000 AS r_v,
           |         CAST(round(total_value * 100) AS BIGINT) // 100 AS m_v FROM agg),
           |nn AS (SELECT count(*) AS n FROM a2),
           |cr AS (
           |  SELECT r_v, CAST((5 * sum(c) OVER (ORDER BY r_v) + (SELECT n FROM nn) - 1)
           |    // (SELECT n FROM nn) AS BIGINT) AS r_q
           |  FROM (SELECT r_v, count(*) AS c FROM a2 GROUP BY r_v)),
           |cf AS (
           |  SELECT n_events, CAST((5 * sum(c) OVER (ORDER BY n_events) + (SELECT n FROM nn) - 1)
           |    // (SELECT n FROM nn) AS BIGINT) AS f_q
           |  FROM (SELECT n_events, count(*) AS c FROM a2 GROUP BY n_events)),
           |cm AS (
           |  SELECT m_v, CAST((5 * sum(c) OVER (ORDER BY m_v) + (SELECT n FROM nn) - 1)
           |    // (SELECT n FROM nn) AS BIGINT) AS m_q
           |  FROM (SELECT m_v, count(*) AS c FROM a2 GROUP BY m_v))
           |SELECT a2.user_id, a2.last_ts, CAST(a2.n_events AS BIGINT) AS n_events,
           |  a2.total_value, r_q, f_q, m_q
           |FROM a2 JOIN cr USING (r_v) JOIN cf USING (n_events) JOIN cm USING (m_v)
           |ORDER BY a2.user_id""".stripMargin)),

    // Linear multi-touch attribution beside the last-touch as-of join:
    // each purchase's value splits equally across the user's clicks in the
    // preceding 24 h. Per-pair credit rows (row-local stab(6) division —
    // no cross-conversion double sums), hash-gated end to end.
    GraftQuery("events_attribution_linear",
      (s, d) => graft.operators.Attribution.linear(Tables.events(s, d))
        .orderBy("conv_event_id", "touch_event_id"),
      Some(
        s"""WITH $evCte,
           |c AS (SELECT event_id AS conv_event_id, user_id, ts AS conv_ts, value
           |      FROM ev WHERE event_type = 'purchase'),
           |t AS (SELECT user_id, event_id AS touch_event_id, ts AS touch_ts
           |      FROM ev WHERE event_type = 'click'),
           |p AS (
           |  SELECT c.conv_event_id, t.touch_event_id, c.user_id, c.value
           |  FROM c JOIN t ON c.user_id = t.user_id
           |    AND t.touch_ts <= c.conv_ts
           |    AND t.touch_ts >= c.conv_ts - INTERVAL 24 HOURS),
           |n AS (SELECT *, count(*) OVER (PARTITION BY conv_event_id) AS n_touches FROM p)
           |SELECT conv_event_id, touch_event_id, user_id,
           |  CAST(n_touches AS BIGINT) AS n_touches,
           |  floor((value / n_touches) * 1000000.0 + 0.5) / 1000000.0 AS credit
           |FROM n ORDER BY conv_event_id, touch_event_id""".stripMargin)),

    // Top starting event paths (first 3 events per user, total-ordered by
    // ts then event_id): the onboarding-flow shape beside funnels and the
    // retention matrix. The per-user window prunes to 3 rows per user
    // (WindowGroupLimit); everything after is aggregate-sized.
    GraftQuery("events_user_paths",
      (s, d) => graft.operators.Paths.userPaths(Tables.events(s, d)),
      Some(
        s"""WITH $evCte,
           |r AS (
           |  SELECT user_id, event_type,
           |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           |  FROM ev),
           |p AS (
           |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
           |  FROM r WHERE rn <= 3 GROUP BY user_id)
           |SELECT path, CAST(count(*) AS BIGINT) AS n_users
           |FROM p GROUP BY path
           |ORDER BY n_users DESC, path LIMIT 20""".stripMargin)),

    // The raw adjacency stream the Markov matrix aggregates — registered
    // on its own so the streaming twin's batch anchor
    // (EventStreams.transitionsEventTime ≡ this, TransitionStreamSpec)
    // is itself driver-gated. Corpus-sized output, per-user window only.
    GraftQuery("events_transitions",
      (s, d) => graft.operators.Paths.transitionPairs(Tables.events(s, d))
        .orderBy("user_id", "cur_id"),
      Some(
        s"""WITH $evCte,
           |pr AS (
           |  SELECT user_id, event_id AS cur_id, event_type AS cur,
           |    lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_id,
           |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           |  FROM ev)
           |SELECT user_id, cur_id, nxt_id, cur, nxt FROM pr
           |WHERE nxt IS NOT NULL ORDER BY user_id, cur_id""".stripMargin)),

    // First-order Markov transition matrix: P(next event type | current),
    // successor by (ts, event_id) per user — the open-ended companion to
    // the fixed-sequence funnel. Per-user lead window, |types|²-bounded
    // aggregates; the normalizer is a window over the aggregated matrix
    // (one corpus pass, PlanShapeSpec-locked).
    GraftQuery("events_markov",
      (s, d) => graft.operators.Paths.markov(Tables.events(s, d))
        .orderBy("cur", "nxt"),
      Some(
        s"""WITH $evCte,
           |pr AS (
           |  SELECT event_type AS cur,
           |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           |  FROM ev),
           |n AS (
           |  SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
           |  FROM pr WHERE nxt IS NOT NULL GROUP BY 1, 2),
           |t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS tot FROM n GROUP BY cur)
           |SELECT n.cur, n.nxt, n.n,
           |  floor(CAST(n.n AS DOUBLE) / CAST(t.tot AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS p
           |FROM n JOIN t USING (cur) ORDER BY cur, nxt""".stripMargin)),

    // Stationary distribution of the event-type Markov chain — 24 unrolled
    // power-iteration rounds over the stab(6)-quantized matrix (24 because
    // the slowest observed mixing rate ~0.63 needs ~20 rounds for 1e-4
    // accuracy), mass sums as DECIMAL(28,12) (exact, order-free) so the
    // oracle's identical unroll hash-matches step for step (the k-means
    // fixed-round discipline). The oracle CTE chain below is generated by
    // the same loop count as the operator's `iters`.
    GraftQuery("events_stationary",
      (s, d) => graft.operators.Paths.stationary(Tables.events(s, d))
        .orderBy("state"),
      Some(stationaryOracle(24))),

    GraftQuery("events_retention",
      (s, d) => graft.operators.Retention.matrix(Tables.events(s, d), 7)
        .orderBy("cohort_day", "day_offset"),
      Some(
        s"""WITH $evCte,
           |f AS (SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
           |      FROM ev GROUP BY 1),
           |act AS (SELECT DISTINCT e.user_id, f.cohort_day,
           |          CAST(datediff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE)) AS INT) AS day_offset
           |        FROM ev e JOIN f ON e.user_id = f.user_id)
           |SELECT cohort_day, day_offset, count(*) AS n_users
           |FROM act WHERE day_offset <= 7
           |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin)),

    // Time-bounded funnel: each step transition must land within 24 h of
    // the previous stage's first touch — the conversion-horizon form real
    // funnel queries use (an unbounded funnel admits a purchase years
    // after the click). Same shrinking-equi-join shape, one extra join
    // predicate per step.
    GraftQuery("events_funnel_windowed",
      (s, d) => graft.operators.Funnel.conversion(Tables.events(s, d),
        Seq("signup", "view", "click", "purchase"),
        within = Some(expr("INTERVAL 24 HOURS"))),
      Some(
        s"""WITH $evCte,
           |s1 AS (SELECT user_id, min(ts) AS t FROM ev WHERE event_type = 'signup' GROUP BY 1),
           |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL '24 HOURS'
           |       WHERE e.event_type = 'view' GROUP BY 1),
           |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL '24 HOURS'
           |       WHERE e.event_type = 'click' GROUP BY 1),
           |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t AND e.ts <= s3.t + INTERVAL '24 HOURS'
           |       WHERE e.event_type = 'purchase' GROUP BY 1)
           |SELECT 1 AS stage, 'signup' AS step, count(*) AS n_users FROM s1
           |UNION ALL SELECT 2, 'view', count(*) FROM s2
           |UNION ALL SELECT 3, 'click', count(*) FROM s3
           |UNION ALL SELECT 4, 'purchase', count(*) FROM s4
           |ORDER BY stage""".stripMargin)),

    // Funnel conversion timing: avg/max milliseconds each transition took
    // among the users who made it — integer-ms arithmetic end to end, so
    // the aggregate hashes exactly cross-engine (avg is Spark `div` /
    // DuckDB `//` integral division: exact even past 2^53, no double
    // round-trip anywhere).
    GraftQuery("events_funnel_timing",
      (s, d) => graft.operators.Funnel.conversionTiming(Tables.events(s, d),
        Seq("signup", "view", "click", "purchase")),
      Some(
        s"""WITH $evCte,
           |s1 AS (SELECT user_id, min(ts) AS t FROM ev WHERE event_type = 'signup' GROUP BY 1),
           |s2 AS (SELECT e.user_id, min(e.ts) AS t, min(s1.t) AS t_prev FROM ev e
           |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
           |       WHERE e.event_type = 'view' GROUP BY 1),
           |s3 AS (SELECT e.user_id, min(e.ts) AS t, min(s2.t) AS t_prev FROM ev e
           |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
           |       WHERE e.event_type = 'click' GROUP BY 1),
           |s4 AS (SELECT e.user_id, min(e.ts) AS t, min(s3.t) AS t_prev FROM ev e
           |       JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
           |       WHERE e.event_type = 'purchase' GROUP BY 1)
           |SELECT 2 AS stage, 'view' AS step, count(*) AS n_users,
           |  CAST(sum(epoch_ms(t) - epoch_ms(t_prev)) // count(*) AS BIGINT) AS avg_ms,
           |  max(epoch_ms(t) - epoch_ms(t_prev)) AS max_ms FROM s2
           |UNION ALL SELECT 3, 'click', count(*),
           |  CAST(sum(epoch_ms(t) - epoch_ms(t_prev)) // count(*) AS BIGINT),
           |  max(epoch_ms(t) - epoch_ms(t_prev)) FROM s3
           |UNION ALL SELECT 4, 'purchase', count(*),
           |  CAST(sum(epoch_ms(t) - epoch_ms(t_prev)) // count(*) AS BIGINT),
           |  max(epoch_ms(t) - epoch_ms(t_prev)) FROM s4
           |ORDER BY stage""".stripMargin)),

    // The completed-funnel cohort (users + their final-step first-touch
    // ts) — the extraction twin of events_funnel.
    GraftQuery("events_funnel_users",
      (s, d) => graft.operators.Funnel.completedUsers(Tables.events(s, d),
        Seq("signup", "view", "click", "purchase"))
        .orderBy("user_id"),
      Some(
        s"""WITH $evCte,
           |s1 AS (SELECT user_id, min(ts) AS t FROM ev WHERE event_type = 'signup' GROUP BY 1),
           |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
           |       WHERE e.event_type = 'view' GROUP BY 1),
           |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
           |       WHERE e.event_type = 'click' GROUP BY 1),
           |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
           |       JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
           |       WHERE e.event_type = 'purchase' GROUP BY 1)
           |SELECT user_id, t AS t_last FROM s4 ORDER BY user_id""".stripMargin)),

    // Day-of-week seasonality index per type — the profile a monitor
    // divides out before CUSUM/EWMA on weekly-patterned series. Exact
    // integer sums + single IEEE divisions: engine-identical doubles
    // with no stabilizer; output |types|×7.
    GraftQuery("events_seasonality",
      (s, d) => graft.operators.Anomaly.seasonality(Tables.events(s, d))
        .orderBy("event_type", "dow"),
      Some(
        s"""WITH $evCte,
           |daily AS (
           |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
           |  FROM ev GROUP BY 1, 2),
           |dw AS (SELECT event_type, CAST(isodow(day) AS INT) AS dow, x FROM daily),
           |pd AS (
           |  SELECT event_type, dow, count(*) AS n_days, sum(x) AS sx
           |  FROM dw GROUP BY 1, 2),
           |ov AS (SELECT event_type, count(*) AS ndg, sum(x) AS sg FROM daily GROUP BY 1)
           |SELECT p.event_type, p.dow, CAST(p.n_days AS BIGINT) AS n_days,
           |  CAST(p.sx AS DOUBLE) / p.n_days AS mean_count,
           |  (CAST(p.sx AS DOUBLE) / p.n_days) / (CAST(o.sg AS DOUBLE) / o.ndg) AS dow_index
           |FROM pd p JOIN ov o USING (event_type)
           |ORDER BY event_type, dow""".stripMargin)),

    // The seasonality profile IN ACTION: CUSUM over weekday-adjusted
    // counts (x/dow_index, micro-unit-quantized once, then the exact
    // integer/decimal moment machinery and the same prefix-min
    // recursion). The composition is hash-gated end to end — profile,
    // adjustment, calibration, recursion.
    GraftQuery("events_cusum_deseasonal",
      (s, d) => graft.operators.Anomaly.cusumDeseasonal(Tables.events(s, d))
        .orderBy("event_type", "day"),
      Some(
        s"""WITH $evCte,
           |daily AS (
           |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
           |  FROM ev GROUP BY 1, 2),
           |dw AS (SELECT event_type, CAST(isodow(day) AS INT) AS dow, x FROM daily),
           |pd AS (
           |  SELECT event_type, dow, count(*) AS n_days, sum(x) AS sx
           |  FROM dw GROUP BY 1, 2),
           |ov AS (SELECT event_type, count(*) AS ndg, sum(x) AS sg FROM daily GROUP BY 1),
           |idx AS (
           |  SELECT p.event_type, p.dow,
           |    (CAST(p.sx AS DOUBLE) / p.n_days) / (CAST(o.sg AS DOUBLE) / o.ndg) AS dow_index
           |  FROM pd p JOIN ov o USING (event_type)),
           |adj AS (
           |  SELECT d.event_type, d.day, d.x,
           |    CAST(floor(CAST(d.x AS DOUBLE) / i.dow_index * 1000000.0 + 0.5) AS BIGINT) AS xq
           |  FROM daily d JOIN idx i
           |    ON i.event_type = d.event_type AND i.dow = CAST(isodow(d.day) AS INT)),
           |st AS (
           |  SELECT event_type, count(*) AS nd, sum(xq) AS s1,
           |    sum(CAST(xq AS DECIMAL(38,0)) * CAST(xq AS DECIMAL(38,0))) AS s2
           |  FROM adj GROUP BY 1),
           |bs AS (
           |  SELECT event_type, CAST(s1 AS DOUBLE)/nd/1000000.0 AS mu,
           |    sqrt(greatest(CAST(CAST(s2 AS VARCHAR) AS DOUBLE)/nd/1000000000000.0
           |      - (CAST(s1 AS DOUBLE)/nd/1000000.0)*(CAST(s1 AS DOUBLE)/nd/1000000.0), 0.0)) AS sig
           |  FROM st),
           |j AS (
           |  SELECT a.event_type, a.day, a.x, CAST(a.xq AS DOUBLE)/1000000.0 AS xa, b.sig,
           |    CAST(floor(((CAST(a.xq AS DOUBLE)/1000000.0 - b.mu) - 0.5*b.sig)*1000000.0 + 0.5) AS BIGINT) AS dq
           |  FROM adj a JOIN bs b USING (event_type)),
           |pw AS (
           |  SELECT event_type, day, x, xa, sig,
           |    sum(dq) OVER (PARTITION BY event_type ORDER BY day) AS p
           |  FROM j),
           |mw AS (
           |  SELECT event_type, day, x, xa, sig, p,
           |    least(CAST(0 AS BIGINT), min(p) OVER (PARTITION BY event_type ORDER BY day)) AS m
           |  FROM pw)
           |SELECT event_type, day, x, xa AS x_adj,
           |  CAST(p - m AS DOUBLE)/1000000.0 AS cusum,
           |  (CAST(p - m AS DOUBLE)/1000000.0) > 4.0 * sig AS flag
           |FROM mw ORDER BY event_type, day""".stripMargin)),

    // One-sided CUSUM drift monitor over per-type daily counts — the
    // clamped recursion via its exact prefix-min closed form (two
    // ordered windows), drift terms quantized to fixed-point longs so
    // the running sum is exact under DuckDB's segment-tree window
    // evaluation as much as Spark's streaming frame (Anomaly.cusum).
    GraftQuery("events_cusum",
      (s, d) => graft.operators.Anomaly.cusum(Tables.events(s, d))
        .orderBy("event_type", "day"),
      Some(
        s"""WITH $evCte,
           |daily AS (
           |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
           |  FROM ev GROUP BY 1, 2),
           |st AS (
           |  SELECT event_type, count(*) AS nd, sum(x) AS s1, sum(x*x) AS s2
           |  FROM daily GROUP BY 1),
           |bs AS (
           |  SELECT event_type, CAST(s1 AS DOUBLE)/nd AS mu,
           |    sqrt(greatest(CAST(s2 AS DOUBLE)/nd
           |      - (CAST(s1 AS DOUBLE)/nd)*(CAST(s1 AS DOUBLE)/nd), 0.0)) AS sig
           |  FROM st),
           |j AS (
           |  SELECT d.event_type, d.day, d.x, b.sig,
           |    CAST(floor(((CAST(d.x AS DOUBLE) - b.mu) - 0.5*b.sig)*1000000.0 + 0.5) AS BIGINT) AS dq
           |  FROM daily d JOIN bs b USING (event_type)),
           |pw AS (
           |  SELECT event_type, day, x, sig,
           |    sum(dq) OVER (PARTITION BY event_type ORDER BY day) AS p
           |  FROM j),
           |mw AS (
           |  SELECT event_type, day, x, sig, p,
           |    least(CAST(0 AS BIGINT), min(p) OVER (PARTITION BY event_type ORDER BY day)) AS m
           |  FROM pw)
           |SELECT event_type, day, CAST(x AS BIGINT) AS x,
           |  CAST(p - m AS DOUBLE) / 1000000.0 AS cusum,
           |  (CAST(p - m AS DOUBLE) / 1000000.0 > 4.0*sig) AS flag
           |FROM mw ORDER BY event_type, day""".stripMargin)),

    // Kaplan–Meier signup→purchase survival (Survival.kaplanMeier):
    // right-censored at stream end, day-granular, emitted as ln S(t)
    // with the cumulative over fixed-point longs (the CUSUM window
    // discipline); an exp() per row would reopen the libm gap.
    GraftQuery("events_survival",
      (s, d) => graft.operators.Survival.kaplanMeier(Tables.events(s, d))
        .orderBy("t"),
      Some(
        s"""WITH $evCte,
           |s0 AS (SELECT user_id, min(epoch_ms(ts)) AS t0 FROM ev
           |       WHERE event_type = 'signup' GROUP BY 1),
           |cv AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS tp FROM ev e
           |       JOIN s0 ON e.user_id = s0.user_id AND epoch_ms(e.ts) >= s0.t0
           |       WHERE e.event_type = 'purchase' GROUP BY 1),
           |mx AS (SELECT max(epoch_ms(ts)) AS mxms FROM ev),
           |obs AS (
           |  SELECT s0.user_id,
           |    CASE WHEN cv.tp IS NOT NULL THEN (cv.tp - s0.t0) // 86400000
           |         ELSE ((SELECT mxms FROM mx) - s0.t0) // 86400000 END AS obs_day,
           |    cv.tp IS NOT NULL AS converted
           |  FROM s0 LEFT JOIN cv USING (user_id)),
           |h AS (SELECT obs_day, count(*) AS c FROM obs GROUP BY 1),
           |ar AS (SELECT obs_day AS t,
           |         CAST(sum(c) OVER (ORDER BY obs_day DESC) AS BIGINT) AS n FROM h),
           |sp AS (SELECT obs_day AS t, count(*) AS d FROM obs WHERE converted GROUP BY 1),
           |tm AS (
           |  SELECT sp.t, ar.n, sp.d,
           |    CAST(floor(ln(CAST(ar.n - sp.d AS DOUBLE) / CAST(ar.n AS DOUBLE))
           |      * 1000000.0 + 0.5) AS BIGINT) AS term6
           |  FROM sp JOIN ar USING (t) WHERE sp.d < ar.n)
           |SELECT t, n AS n_at_risk, d AS n_converted,
           |  CAST(CAST(sum(term6) OVER (ORDER BY t) AS BIGINT) AS DOUBLE) / 1000000.0 AS ln_s
           |FROM tm ORDER BY t""".stripMargin)),

    // Per-user gap-regularity bot score: cv = √(n·S₂ − S₁²)/S₁ over
    // exact DECIMAL(38,0) inter-event-gap moments (Anomaly.botScore) —
    // machine traffic fires on a clock, so low cv flags it.
    GraftQuery("events_bot_score",
      (s, d) => graft.operators.Anomaly.botScore(Tables.events(s, d))
        .orderBy("user_id"),
      Some(
        s"""WITH $evCte,
           |e2 AS (SELECT user_id, ts, event_id, epoch_ms(ts) AS ms FROM ev),
           |gp AS (
           |  SELECT user_id,
           |    ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           |  FROM e2),
           |st AS (
           |  SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
           |    sum(CAST(gap AS HUGEINT)) AS s1, sum(CAST(gap AS HUGEINT) * gap) AS s2
           |  FROM gp WHERE gap IS NOT NULL GROUP BY 1 HAVING count(*) >= 2),
           |sc AS (
           |  SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           |    floor(sqrt(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE))
           |      / CAST(CAST(s1 AS VARCHAR) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS cv
           |  FROM st)
           |SELECT user_id, n_gaps, cv, (cv < 0.3) AS is_regular
           |FROM sc ORDER BY user_id""".stripMargin)),

    // EWMA forecast baseline + residuals over per-type daily counts
    // (Anomaly.ewma) — exact fixed-point integer recursion (α = 1/8,
    // truncating division both engines), oracle as a RECURSIVE CTE stepping
    // the identical sequence. The recursion has no prefix closed form
    // (geometric weights), so the driver folds the calendar-bounded
    // daily series — the events_stationary metadata contract.
    GraftQuery("events_ewma",
      (s, d) => graft.operators.Anomaly.ewma(Tables.events(s, d))
        .orderBy("event_type", "day"),
      Some(
        s"""WITH RECURSIVE ${evCte.stripPrefix("")},
           |daily AS (
           |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
           |  FROM ev GROUP BY 1, 2),
           |rk AS (
           |  SELECT event_type, day, CAST(x AS BIGINT) AS x,
           |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
           |  FROM daily),
           |ew AS (
           |  SELECT event_type, day, x, rn, x * 1000000 AS s, CAST(0 AS BIGINT) AS dev6
           |  FROM rk WHERE rn = 1
           |  UNION ALL
           |  SELECT r.event_type, r.day, r.x, r.rn,
           |    e.s + ((r.x * 1000000 - e.s) // 8) AS s,
           |    r.x * 1000000 - e.s AS dev6
           |  FROM rk r JOIN ew e ON e.event_type = r.event_type AND r.rn = e.rn + 1)
           |SELECT event_type, day, x,
           |  CAST(s AS DOUBLE) / 1000000.0 AS ewma,
           |  CAST(dev6 AS DOUBLE) / 1000000.0 AS dev
           |FROM ew ORDER BY event_type, day""".stripMargin)),

    // EWMA backtest card — the forecast-quality rollup over the same
    // recursion events_ewma pins: dev IS the one-step-ahead error, so
    // per-type MAE and bias come off exact micro-unit sums (first day
    // excluded: its dev=0 is definitional, not a forecast).
    GraftQuery("events_ewma_backtest",
      (s, d) => graft.operators.Anomaly.ewmaBacktest(Tables.events(s, d))
        .orderBy("event_type"),
      Some(
        s"""WITH RECURSIVE ${evCte.stripPrefix("")},
           |daily AS (
           |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
           |  FROM ev GROUP BY 1, 2),
           |rk AS (
           |  SELECT event_type, day, CAST(x AS BIGINT) AS x,
           |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
           |  FROM daily),
           |ew AS (
           |  SELECT event_type, day, x, rn, x * 1000000 AS s, CAST(0 AS BIGINT) AS dev6
           |  FROM rk WHERE rn = 1
           |  UNION ALL
           |  SELECT r.event_type, r.day, r.x, r.rn,
           |    e.s + ((r.x * 1000000 - e.s) // 8) AS s,
           |    r.x * 1000000 - e.s AS dev6
           |  FROM rk r JOIN ew e ON e.event_type = r.event_type AND r.rn = e.rn + 1)
           |SELECT event_type, count(*) AS n_days,
           |  CAST(sum(abs(dev6)) AS DOUBLE) / count(*) / 1000000.0 AS mae,
           |  CAST(sum(dev6) AS DOUBLE) / count(*) / 1000000.0 AS bias
           |FROM ew WHERE rn >= 2
           |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Session-scoped co-occurrence PMI over event types — the
    // related-items affinity statistic (Affinity.cooccurPmi): session
    // incidence via the same gap sessionizer as events_sessionize, pairs
    // by a session-keyed self-join (≤ |types|² per session), PMI
    // stab(6)'d over the exact incidence counts.
    GraftQuery("events_cooccur_pmi",
      (s, d) => graft.operators.Affinity.cooccurPmi(Tables.events(s, d), 30)
        .orderBy("type_a", "type_b"),
      Some(
        s"""WITH $evCte,
           |e AS (
           |  SELECT user_id, ts, event_id, event_type,
           |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
           |           (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000
           |         THEN 0 ELSE 1 END AS new_s
           |  FROM ev),
           |st AS MATERIALIZED (
           |  SELECT DISTINCT user_id, session_id, event_type FROM (
           |    SELECT user_id, event_type,
           |      CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
           |    FROM e)),
           |ns AS (SELECT count(*) AS n FROM (SELECT DISTINCT user_id, session_id FROM st)),
           |sg AS (SELECT event_type, count(*) AS n FROM st GROUP BY event_type),
           |pr AS (
           |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_ab
           |  FROM st a JOIN st b ON a.user_id = b.user_id AND a.session_id = b.session_id
           |    AND a.event_type < b.event_type
           |  GROUP BY 1, 2)
           |SELECT pr.type_a, pr.type_b, pr.n_ab, na.n AS n_a, nb.n AS n_b,
           |  floor(ln((CAST(pr.n_ab AS DOUBLE) * CAST((SELECT n FROM ns) AS DOUBLE))
           |    / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)))*1000000.0+0.5)/1000000.0 AS pmi
           |FROM pr JOIN sg na ON na.event_type = pr.type_a
           |        JOIN sg nb ON nb.event_type = pr.type_b
           |ORDER BY type_a, type_b""".stripMargin))
  )

  /** Sliding 2h/1h window via explicit window-start enumeration: event at t
    * belongs to windows starting at trunc(t)-1h and trunc(t). Mirrors
    * Structured Streaming's `window(ts, "2 hours", "1 hour")` expansion.
    */
  lazy val slidingWindow: GraftQuery = GraftQuery("events_sliding",
    (s, d) => Tables.events(s, d)
      .select(col("event_type"), col("value"),
        explode(array(
          date_trunc("hour", col("ts")),
          date_trunc("hour", col("ts")) - expr("INTERVAL 1 HOUR"))).as("w_start"))
      .groupBy("w_start", "event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .orderBy("w_start", "event_type"),
    Some(
      s"""WITH $evCte
         |SELECT w_start, event_type, count(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM (
         |  SELECT event_type, value, unnest([
         |    date_trunc('hour', ts),
         |    date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS w_start
         |  FROM ev)
         |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin))
}
