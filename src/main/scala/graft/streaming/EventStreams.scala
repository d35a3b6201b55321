package graft.streaming

import graft.functions.Stable.dsum
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming pipelines over the `events` schema. Batch twins of
  * the aggregations live in graft.queries.EventQueries (DuckDB-verifiable);
  * these run the same logic under watermarks / incremental state.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling 1-hour windowed counts/sums with a 10-minute watermark —
    * late events beyond the watermark are dropped, state is purged as the
    * watermark passes each window end.
    */
  def hourlyWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 2h/1h windowed counts (streaming twin of events_sliding). */
  def slidingWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Stream-stream interval join: attribute each purchase to view events of
    * the same user within the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so state for either
    * side is purged once the watermark passes the interval — the canonical
    * bounded-state stream-stream join. (Batch as-of twin:
    * operators.AsOf.joinBackward / events_asof_attrib.)
    */
  def attributionJoin(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    p.join(v, expr(
      """p_user = v_user AND
        |v_ts <= p_ts AND v_ts >= p_ts - INTERVAL 1 HOUR""".stripMargin))
      .select(col("p_id"), col("p_user").as("user_id"), col("p_ts"),
        col("view_id"), col("v_ts"))
  }

  /** LEFT OUTER variant of the attribution join: purchases with NO view in
    * the preceding hour still emit, null-padded — but only once the
    * watermark proves no matching view can still arrive (Spark holds the
    * unmatched left row in state until then; emitting earlier would be
    * wrong, retracting is impossible in append mode). Same bounded-state
    * discipline as the inner form: both sides watermarked, the join
    * condition bounds event-time distance, state purges as the watermark
    * passes. The batch twin is the as-of LEFT join (events_asof_attrib).
    */
  def attributionJoinLeftOuter(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    p.join(v, expr(
      """p_user = v_user AND
        |v_ts <= p_ts AND v_ts >= p_ts - INTERVAL 1 HOUR""".stripMargin), "leftOuter")
      .select(col("p_id"), col("p_user").as("user_id"), col("p_ts"),
        col("view_id"), col("v_ts"))
  }

  /** Built-in session windows (30-min gap) — the declarative twin of the
    * stateful `sessions` below; use this unless session semantics outgrow
    * `session_window` (then flatMapGroupsWithState).
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("w_start"), col("w.end").as("w_end"), col("n_events"))

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)
  case class SessionState(sessionId: Long, nEvents: Long, startMs: Long, lastMs: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        start_ms: Long, end_ms: Long)

  case class FunnelState(stage: Int, lastMs: Long)
  case class FunnelOut(user_id: Long, completed_ms: Long)

  case class BufEv(ms: Long, id: Long, tpe: String)
  case class FunnelBufState(stage: Int, lastMs: Long, buf: Seq[BufEv])

  /** Streaming twin of operators.Funnel.completedUsers: emit each user the
    * moment they finish the strict-order funnel. Per-user state is one
    * (stage, lastMs) pair — bounded regardless of event volume — advanced
    * greedily over event-time-sorted events: the first event of the next
    * step strictly after the previous step's timestamp is that step's
    * first touch, which reproduces the batch per-stage-min semantics ONLY
    * under in-order arrival ACROSS micro-batches: a step event reordered
    * across batches (click in batch N, its preceding view in batch N+1)
    * stalls the user at the earlier stage even though both events are
    * within the watermark — the watermark bounds lateness, not cross-batch
    * ordering. (`funnelCompletionsEventTime` below buffers out-of-order
    * step events until the watermark passes and has no such caveat; this
    * operator trades that buffer for one-pair-per-user state, the same
    * in-order caveat as `sessions`.) Completed users emit once and their state is
    * removed; users who stall longer than `abandonMinutes` past their last
    * accepted step are purged by event-time timeout — without it every
    * never-converting visitor would hold state forever. (After removal a
    * user who runs the WHOLE funnel again emits a second cohort row;
    * batch extraction collapses to the first chain — dedupe downstream if
    * once-ever semantics matter.)
    */
  def funnelCompletions(events: Dataset[Ev], steps: Seq[String],
                        abandonMinutes: Int = 60,
                        withinMinutes: Option[Int] = None): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val abandonMs = abandonMinutes * 60000L
    // conversion horizon (batch twin: Funnel's `within`): a step event more
    // than withinMs after the previous stage's first touch doesn't advance
    // the funnel. Long.MaxValue = unbounded; stage 0 is never bounded
    // (lastMs = MinValue).
    val withinMs = withinMinutes.map(_ * 60000L).getOrElse(Long.MaxValue)
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, evs: Iterator[Ev], state: GroupState[FunnelState]) => {
        if (state.hasTimedOut) {
          state.remove() // abandoned mid-funnel: purge, emit nothing
          Iterator.empty
        } else {
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          var done: FunnelOut = null
          sorted.foreach { e =>
            if (done == null && e.event_type == steps(st.stage) &&
                e.ts.getTime > st.lastMs &&
                (st.stage == 0 || e.ts.getTime - st.lastMs <= withinMs)) {
              st = FunnelState(st.stage + 1, e.ts.getTime)
              if (st.stage == steps.length) done = FunnelOut(userId, st.lastMs)
            }
          }
          if (done != null) {
            state.remove() // completes once; the cohort row is emitted now
            Iterator.single(done)
          } else {
            state.update(st)
            state.setTimeoutTimestamp(math.max(st.lastMs, sorted.last.ts.getTime) + abandonMs)
            Iterator.empty
          }
        }
      })
  }

  /** TRUE event-time streaming funnel: the `funnelCompletions` twin that
    * buffers step events in state until the watermark passes them, then
    * advances the greedy chain in EVENT-TIME order — so events reordered
    * ACROSS micro-batches (click in batch N, its preceding view in batch
    * N+1) are sequenced correctly as long as they arrive within the
    * watermark. This closes the plain twin's in-order-arrival caveat at
    * the standard price: per-user state grows with the user's un-finalized
    * step events inside one watermark horizon (bounded by event rate ×
    * horizon — the same bound every event-time stateful operator carries),
    * vs the plain twin's constant one-pair state. Pick per stream: strict
    * ordering guarantees → plain; out-of-order transport → this.
    *
    * Only events whose type appears in `steps` are buffered (filter
    * pushed before the shuffle); finalized events are dropped from state
    * immediately. Completed users emit once and purge; stalled users
    * purge via event-time timeout `abandonMinutes` past their last
    * buffered/accepted event.
    */
  def funnelCompletionsEventTime(events: Dataset[Ev], steps: Seq[String],
                                 abandonMinutes: Int = 60,
                                 withinMinutes: Option[Int] = None): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val abandonMs = abandonMinutes * 60000L
    val withinMs = withinMinutes.map(_ * 60000L).getOrElse(Long.MaxValue)
    val stepSet = steps.toSet
    events
      .filter(e => stepSet.contains(e.event_type))
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, evs: Iterator[Ev], state: GroupState[FunnelBufState]) => {
        val prev = state.getOption.getOrElse(FunnelBufState(0, Long.MinValue, Nil))
        if (state.hasTimedOut && prev.buf.isEmpty) {
          state.remove() // abandoned mid-funnel, nothing buffered: purge
          Iterator.empty
        } else {
          // the group function only runs on new data or a timeout — so a
          // non-empty buffer always arms a timeout just past its earliest
          // event, making the WATERMARK the finalization trigger even for
          // users whose stream has gone quiet
          val buf = prev.buf ++ evs.map(e => BufEv(e.ts.getTime, e.event_id, e.event_type))
          val wm = state.getCurrentWatermarkMs()
          // finalize: events the watermark has passed can no longer be
          // preceded by anything — run them through the chain in
          // event-time order; keep the rest buffered
          val (ready, pending) = buf.partition(_.ms <= wm)
          var st = (prev.stage, prev.lastMs)
          var done: FunnelOut = null
          ready.sortBy(e => (e.ms, e.id)).foreach { e =>
            if (done == null && e.tpe == steps(st._1) && e.ms > st._2 &&
                (st._1 == 0 || e.ms - st._2 <= withinMs)) {
              st = (st._1 + 1, e.ms)
              if (st._1 == steps.length) done = FunnelOut(userId, e.ms)
            }
          }
          if (done != null) {
            state.remove() // completes once; buffered later events discarded
            Iterator.single(done)
          } else {
            state.update(FunnelBufState(st._1, st._2, pending))
            val t =
              if (pending.nonEmpty) pending.map(_.ms).min + 1 // re-finalize when wm passes it
              else math.max(st._2, wm) + abandonMs // nothing buffered: abandonment purge
            state.setTimeoutTimestamp(math.max(t, wm + 1))
            Iterator.empty
          }
        }
      })
  }

  /** Stateful gap-based sessionization via flatMapGroupsWithState: closes a
    * session when the next event for the user arrives more than
    * `gapMinutes` after the previous one — or, for users that go silent,
    * when the event-time watermark passes last_event + gap (event-time
    * timeout). Without the timeout, a departed user's final session would
    * sit in the state store forever: unbounded state AND a never-emitted
    * result. Batch twin: graft.operators.Sessionize (lag + running sum).
    *
    * Note: events within a micro-batch are sorted per user here; across
    * micro-batches the state carries (lastMs). Correct under event-time
    * ordering per batch — the standard pattern for append-mode session
    * emission.
    */
  def sessions(events: Dataset[Ev], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
        if (state.hasTimedOut) {
          // watermark passed lastMs + gap with no new events: close & purge
          val s = state.get
          state.remove()
          Iterator.single(SessionOut(userId, s.sessionId, s.nEvents, s.startMs, s.lastMs))
        } else {
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            val ms = e.ts.getTime
            st match {
              case null =>
                st = SessionState(1L, 1L, ms, ms)
              case s if ms - s.lastMs <= gapMs =>
                st = s.copy(nEvents = s.nEvents + 1, lastMs = ms)
              case s =>
                closed += SessionOut(userId, s.sessionId, s.nEvents, s.startMs, s.lastMs)
                st = SessionState(s.sessionId + 1, 1L, ms, ms)
            }
          }
          if (st != null) {
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + gapMs)
          }
          closed.result().iterator
        }
      })
  }
}
