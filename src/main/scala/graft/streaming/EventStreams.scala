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
  case class SessionBufState(nextId: Long, open: Option[SessionState], buf: Seq[BufEv])

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
    * buffered/accepted event — the abandonment deadline caps the
    * re-finalize trigger too, so a user whose buffered events the
    * watermark never reaches (a stalled source) is still purged instead
    * of holding state forever.
    *
    * State bounds, beyond the watermark horizon itself:
    *  - buffered events that can no longer be a first touch are pruned
    *    each invocation: an event at-or-before the accepted chain's last
    *    timestamp can never satisfy `ms > lastMs` again (the chain only
    *    moves forward), and an event whose type occurs only at
    *    already-passed steps can never be consumed;
    *  - `maxBuffered` hard-caps the per-user buffer: when a user spams
    *    more out-of-order step events than that inside one watermark
    *    horizon, the EARLIEST `maxBuffered` by (ms, id) are kept and the
    *    latest dropped — first-touch semantics prefer the earliest event
    *    of each step, so a drop can only affect a user whose completion
    *    hinged on an event later than `maxBuffered` buffered predecessors
    *    (pathological spam; bounded state is worth that miss).
    */
  def funnelCompletionsEventTime(events: Dataset[Ev], steps: Seq[String],
                                 abandonMinutes: Int = 60,
                                 withinMinutes: Option[Int] = None,
                                 maxBuffered: Int = 10000): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxBuffered > 0, "maxBuffered must be positive")
    val abandonMs = abandonMinutes * 60000L
    val withinMs = withinMinutes.map(_ * 60000L).getOrElse(Long.MaxValue)
    val stepSet = steps.toSet
    // last step index each type occurs at: a buffered event whose type
    // never recurs at-or-after the current stage is dead weight
    val lastIdx: Map[String, Int] =
      steps.zipWithIndex.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).max }
    events
      .filter(e => stepSet.contains(e.event_type))
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, evs: Iterator[Ev], state: GroupState[FunnelBufState]) => {
        val prev = state.getOption.getOrElse(FunnelBufState(0, Long.MinValue, Nil))
        // the group function only runs on new data or a timeout — so a
        // non-empty buffer always arms a timeout just past its earliest
        // event (capped by the abandonment deadline), making the WATERMARK
        // the finalization trigger even for users whose stream has gone
        // quiet
        val buf = prev.buf ++ evs.map(e => BufEv(e.ts.getTime, e.event_id, e.event_type))
        val wm = state.getCurrentWatermarkMs()
        // finalize: events the watermark has passed can no longer be
        // preceded by anything — run them through the chain in
        // event-time order; keep the rest buffered
        val (ready, pending) = buf.partition(_.ms <= wm)
        if (state.hasTimedOut && ready.isEmpty) {
          // a timeout invocation carries no new events, and the
          // re-finalize trigger only fires once the watermark has entered
          // the buffer (ready non-empty) — so THIS firing was the
          // abandonment deadline: the user stalled past abandonMs with no
          // watermark progress. Purge, buffered events included (they
          // could only extend an abandoned chain).
          state.remove()
          Iterator.empty
        } else {
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
            // prune dead buffer entries (see doc), then hard-cap keeping
            // the earliest — both invariants hold on EVERY path that
            // updates state, so buffer size is bounded regardless of
            // arrival pattern
            val livePending = pending.filter(e =>
              e.ms > st._2 && lastIdx(e.tpe) >= st._1)
            val kept =
              if (livePending.length <= maxBuffered) livePending
              else livePending.sortBy(e => (e.ms, e.id)).take(maxBuffered)
            state.update(FunnelBufState(st._1, st._2, kept))
            // abandonment deadline caps the re-finalize trigger: a buffer
            // the watermark hasn't entered abandonMs later (ready empty at
            // the fire) is more than abandonMs in the stream's future —
            // garbage-clock data — and hits the purge above instead of
            // re-arming forever. Guarded on an INITIALIZED watermark:
            // at cold start wm is 0 (epoch), every buffered event looks
            // decades "future", and the deadline would purge healthy
            // users before the first real watermark lands.
            val abandonAt = math.max(st._2, wm) + abandonMs
            val t =
              if (kept.isEmpty) abandonAt
              else if (wm <= 0) kept.map(_.ms).min + 1
              else math.min(kept.map(_.ms).min + 1, abandonAt)
            state.setTimeoutTimestamp(math.max(t, wm + 1))
            Iterator.empty
          }
        }
      })
  }

  case class AttrEv(ms: Long, id: Long, isConv: Boolean, value: Double)
  case class AttrState(buf: Seq[AttrEv])
  case class AttributionOut(conv_event_id: Long, touch_event_id: Long,
                            user_id: Long, n_touches: Long, credit: Double)

  /** TRUE event-time streaming linear attribution — the streaming twin of
    * `Attribution.linear`: a conversion finalizes once the watermark
    * passes its timestamp (any not-yet-arrived touch with an earlier
    * event time would be beyond the watermark), then credits value/n to
    * every buffered touch inside the lookback window, exactly the batch
    * rule — so out-of-order touches (click arriving AFTER its purchase,
    * with an earlier event time) are credited correctly as long as they
    * arrive within the watermark; later than that they are missed, the
    * standard event-time caveat every operator in this family documents.
    *
    * State bound: per-user buffered events inside (lookback + watermark)
    * — touches older than watermark − lookback can qualify no future
    * conversion and are pruned every invocation; finalized conversions
    * leave the buffer immediately; `maxBuffered` hard-caps pathological
    * spam keeping the MOST RECENT touches — the oldest are the ones the
    * lookback prune would discard soonest, while the newest are the ones
    * upcoming conversions credit (a drop shrinks that user's n for later
    * conversions — bounded state is worth the miss). A user with a quiet
    * stream still finalizes/prunes via event-time timeout armed at the
    * next actionable instant (earliest pending conversion, or earliest
    * touch's prune deadline), cold-start-guarded like the funnel.
    */
  def linearAttributionEventTime(events: Dataset[Ev],
                                 convType: String = "purchase",
                                 touchType: String = "click",
                                 lookbackMinutes: Int = 24 * 60,
                                 maxBuffered: Int = 10000): Dataset[AttributionOut] = {
    import events.sparkSession.implicits._
    require(maxBuffered > 0, "maxBuffered must be positive")
    val lookMs = lookbackMinutes * 60000L
    events
      .filter(e => e.event_type == convType || e.event_type == touchType)
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, evs: Iterator[Ev], state: GroupState[AttrState]) => {
        val prev = state.getOption.map(_.buf).getOrElse(Nil)
        val buf = prev ++ evs.map(e =>
          AttrEv(e.ts.getTime, e.event_id, e.event_type == convType, e.value))
        val wm = state.getCurrentWatermarkMs()
        // STRICT ms < wm: Spark does not treat ts == watermark as late, so
        // a touch stamped exactly at the conversion's timestamp can still
        // arrive while wm == conv.ms — finalizing at <= would miss it
        // where the batch twin (touch_ts <= conv_ts) credits it
        val (readyConv, rest) = buf.partition(e => e.isConv && e.ms < wm)
        val out = readyConv.sortBy(e => (e.ms, e.id)).flatMap { c =>
          val touches = rest.filter(t => !t.isConv &&
            t.ms <= c.ms && t.ms >= c.ms - lookMs)
          val n = touches.length.toLong
          touches.sortBy(t => (t.ms, t.id)).map { t =>
            AttributionOut(c.id, t.id, userId, n,
              math.floor(c.value / n * 1e6 + 0.5) / 1e6) // Stable.stab(_, 6)
          }
        }
        val live = rest.filter(e => e.isConv || e.ms + lookMs >= wm)
        // cap TOUCHES only: pending conversions are already bounded by
        // watermark finalization, and evicting one would silently drop a
        // whole conversion (review finding) — a touch drop only shrinks a
        // later conversion's n_touches, the documented trade. Evict the
        // OLDEST touches (keep takeRight of the (ms,id) sort): the oldest
        // are the ones the lookback prune discards soonest anyway, while
        // the newest are exactly those most likely to qualify for upcoming
        // conversions — so under touch spam the stream stays as close to
        // the batch twin as the cap allows (round-13 review fix).
        val (convs, touches) = live.partition(_.isConv)
        val kept = convs ++ (
          if (touches.length <= maxBuffered) touches
          else touches.sortBy(e => (e.ms, e.id)).takeRight(maxBuffered))
        if (kept.isEmpty) state.remove()
        else {
          state.update(AttrState(kept))
          val nextConv = kept.filter(_.isConv).map(_.ms + 1)
          val nextPrune = kept.filter(!_.isConv).map(_.ms + lookMs + 1)
          state.setTimeoutTimestamp(
            math.max((nextConv ++ nextPrune).min, wm + 1))
        }
        out.iterator
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
    * emission. Out-of-order transport across batches → use
    * `sessionsEventTime` (buffer-to-watermark, the same treatment the
    * funnel's buffering twin gets), which trades one-record state for
    * exact batch-equivalent sessionization under reordering.
    */
  /** TRUE event-time sessionization: the `sessions` twin that buffers
    * events in state until the watermark passes them, then runs the gap
    * logic in EVENT-TIME order — so events reordered ACROSS micro-batches
    * are sessionized exactly as the batch operator (Sessionize.sessions)
    * would, session numbering included (sessions close in event-time
    * order here, which is what the batch row_number reproduces; the plain
    * twin's arrival-order processing can split or mis-number sessions
    * under cross-batch reordering — its documented caveat). Same price as
    * the funnel's buffering twin: per-user state grows with un-finalized
    * events inside one watermark horizon, pruned by the same two bounds —
    * finalized events leave state immediately, and `maxBuffered` hard-caps
    * the buffer keeping the EARLIEST events (dropping the latest can only
    * affect a user spamming more than maxBuffered out-of-order events in
    * one horizon). A session closes when the watermark passes
    * last_event + gap (no in-gap event can still arrive) or when the gap
    * is observed between finalized events; a user whose buffered events
    * the watermark never reaches (stalled source) is closed-and-purged
    * `stallMinutes` past the watermark — buffered events drop with it, so
    * stalled-source state is bounded in TIME as well as size (a purged
    * user's later events restart numbering at 1 — dedupe downstream on
    * (user_id, session_start) if a stalled stream can resume).
    */
  def sessionsEventTime(events: Dataset[Ev], gapMinutes: Int,
                        stallMinutes: Int = 60,
                        maxBuffered: Int = 10000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    require(maxBuffered > 0, "maxBuffered must be positive")
    val gapMs = gapMinutes * 60000L
    val stallMs = stallMinutes * 60000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, evs: Iterator[Ev], state: GroupState[SessionBufState]) => {
        val prev = state.getOption.getOrElse(SessionBufState(1L, None, Nil))
        val buf = prev.buf ++ evs.map(e => BufEv(e.ts.getTime, e.event_id, e.event_type))
        val wm = state.getCurrentWatermarkMs()
        val (ready, pending) = buf.partition(_.ms <= wm)
        // did the watermark prove the open session closed? (distinguishes
        // a close-trigger timeout from the stall deadline below)
        val closeByWm = prev.open.exists(s => wm > s.lastMs + gapMs)
        if (state.hasTimedOut && ready.isEmpty && !closeByWm) {
          // neither the re-finalize nor the session-close trigger fired,
          // so this was the stall deadline: the watermark sat short of
          // every buffered event for stallMinutes. Close what's open,
          // drop the unreachable buffer, purge.
          state.remove()
          prev.open.map(s =>
            SessionOut(userId, s.sessionId, s.nEvents, s.startMs, s.lastMs)).iterator
        } else {
          var nextId = prev.nextId
          var st = prev.open.orNull
          val closed = Seq.newBuilder[SessionOut]
          ready.sortBy(e => (e.ms, e.id)).foreach { e =>
            st match {
              case null =>
                st = SessionState(nextId, 1L, e.ms, e.ms); nextId += 1
              case s if e.ms - s.lastMs <= gapMs =>
                st = s.copy(nEvents = s.nEvents + 1, lastMs = e.ms)
              case s =>
                closed += SessionOut(userId, s.sessionId, s.nEvents, s.startMs, s.lastMs)
                st = SessionState(nextId, 1L, e.ms, e.ms); nextId += 1
            }
          }
          // watermark-proven close: no event ≤ lastMs + gap can still
          // arrive, and every still-buffered event is > wm > lastMs + gap
          // — it would start a new session anyway
          if (st != null && wm > st.lastMs + gapMs) {
            closed += SessionOut(userId, st.sessionId, st.nEvents, st.startMs, st.lastMs)
            st = null
          }
          val kept =
            if (pending.length <= maxBuffered) pending
            else pending.sortBy(e => (e.ms, e.id)).take(maxBuffered)
          if (st == null && kept.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessionBufState(nextId, Option(st), kept))
            // stall deadline armed only once the watermark has initialized
            // (wm 0 = epoch = cold start — see the funnel twin's note);
            // there is always ≥1 trigger: state exists ⇒ open or buffered
            val stallAt = math.max(if (st != null) st.lastMs else Long.MinValue, wm) + stallMs
            val triggers =
              (if (kept.nonEmpty) Seq(kept.map(_.ms).min + 1) else Nil) ++
                (if (st != null) Seq(st.lastMs + gapMs + 1) else Nil) ++
                (if (wm > 0) Seq(stallAt) else Nil)
            state.setTimeoutTimestamp(math.max(triggers.min, wm + 1))
          }
          closed.result().iterator
        }
      })
  }

  case class TransBufState(buf: Seq[BufEv])
  case class TransitionOut(user_id: Long, cur_id: Long, nxt_id: Long,
                           cur: String, nxt: String)

  /** Streaming twin of the Markov adjacency stream
    * (graft.operators.Paths.transitionPairs): emits each user's
    * consecutive (cur → next) event pair exactly once, in event-time
    * order, robust to reordering inside the watermark delay.
    *
    * Finalization rule: a pair is emitted once the watermark reaches its
    * SUCCESSOR — at that point no late row can insert between the two or
    * tie with the successor: flatMapGroupsWithState's late-event filter
    * drops arrivals at-or-below the watermark before they reach the
    * operator (TransitionStreamSpec pins that boundary empirically), so
    * settled adjacency is final. The last
    * settled event stays in state as the tail: a future arrival with
    * ts ≥ watermark may still become ITS successor. State per user is
    * therefore tail + the inside-horizon pending buffer — the same bound
    * as the sessionize twin — with `maxBuffered` keeping the EARLIEST
    * events under spam (the contiguous prefix preserves emitted-pair
    * adjacency; drops can only fabricate one adjacency across the
    * dropped gap, the documented cap trade). TransitionStreamSpec pins
    * prefix equality against the batch pair set at every micro-batch.
    */
  def transitionsEventTime(events: Dataset[Ev],
                           maxBuffered: Int = 10000): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._
    require(maxBuffered > 0, "maxBuffered must be positive")
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, evs: Iterator[Ev], state: GroupState[TransBufState]) => {
        val buf = (state.getOption.map(_.buf).getOrElse(Nil) ++
          evs.map(e => BufEv(e.ts.getTime, e.event_id, e.event_type)))
          .sortBy(e => (e.ms, e.id))
        val wm = state.getCurrentWatermarkMs()
        val nSettled = buf.count(_.ms <= wm)
        val out = (1 until nSettled).map { i =>
          TransitionOut(userId, buf(i - 1).id, buf(i).id,
            buf(i - 1).tpe, buf(i).tpe)
        }
        // keep the last settled event (the tail) + everything pending
        val remaining = buf.drop(math.max(nSettled - 1, 0))
        val kept =
          if (remaining.length <= maxBuffered) remaining
          else remaining.take(maxBuffered)
        if (kept.isEmpty) { if (state.exists) state.remove() }
        else {
          state.update(TransBufState(kept))
          // re-finalize when the watermark reaches the earliest pending
          // event; a tail-only state needs no trigger (nothing can
          // finalize without a new arrival) and is one row — the
          // |users| bound
          val pendingMs = kept.collect { case e if e.ms > wm => e.ms }
          if (pendingMs.nonEmpty)
            state.setTimeoutTimestamp(math.max(pendingMs.min + 1, wm + 1))
        }
        out.iterator
      })
  }

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

  case class EwmaState(s: Long, lastDayMs: Long)
  case class EwmaRow(event_type: String, day_ms: Long, x: Long,
                     ewma: Double, dev: Double)

  /** Streaming twin of Anomaly.ewma's fold: per-type state is the
    * fixed-point smoothed level (one long), stepped with the identical
    * truncating-division recursion over daily counts in day order —
    * first observed day seeds the level (dev 0), later-or-equal days
    * are rejected loudly (the cusumStream discipline). EwmaStreamSpec
    * pins prefix equality against the batch fold at every micro-batch.
    */
  def ewmaStream(daily: DataFrame, alphaDen: Long = 8L): Dataset[EwmaRow] = {
    import daily.sparkSession.implicits._
    daily
      .select(col("event_type").cast("string"), col("day_ms").cast("long"),
        col("x").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (tpe: String, it: Iterator[(String, Long, Long)],
         state: GroupState[EwmaState]) => {
          var st = state.getOption.getOrElse(EwmaState(0L, Long.MinValue))
          val rows = it.toArray.sortBy(_._2)
          val out = rows.map { case (_, dayMs, x) =>
            require(dayMs > st.lastDayMs,
              s"day $dayMs arrived at or before the folded high-water mark ${st.lastDayMs} for $tpe")
            val x6 = x * 1000000L
            val first = st.lastDayMs == Long.MinValue
            val dev6 = if (first) 0L else x6 - st.s
            val s2 = if (first) x6 else st.s + dev6 / alphaDen // truncating, = batch fold
            st = EwmaState(s2, dayMs)
            EwmaRow(tpe, dayMs, x, s2.toDouble / 1e6, dev6.toDouble / 1e6)
          }
          state.update(st)
          out.iterator
        })
  }

  case class CusumState(s: Long, lastDayMs: Long)
  case class CusumRow(event_type: String, day_ms: Long, x: Long,
                      cusum: Double, flag: Boolean)

  /** Streaming twin of the CUSUM monitor's ONLINE half
    * (Anomaly.cusumFrom): per-type state is ONE long — the clamped
    * statistic itself, folded as s ← max(0, s + dq) over daily counts
    * arriving in day order (out-of-order days within a micro-batch are
    * sorted; a day earlier than the high-water mark is rejected loudly —
    * a drift monitor silently folding late days would corrupt every
    * subsequent statistic). The drift quantization floor(((x−μ)−kσ)·10⁶)
    * is computed JVM-side with the same IEEE sequence as the in-plan
    * Anomaly.driftQ, and the baseline (μ, σ) is the offline calibration
    * handed in as a map — exactly how a production monitor deploys:
    * calibrate offline, fold online. CusumStreamSpec pins prefix
    * equality against the batch windows at every micro-batch.
    */
  def cusumStream(daily: DataFrame, baseline: Map[String, (Double, Double)],
                  k: Double = 0.5, h: Double = 4.0): Dataset[CusumRow] = {
    import daily.sparkSession.implicits._
    daily
      .select(col("event_type").cast("string"), col("day_ms").cast("long"),
        col("x").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (tpe: String, it: Iterator[(String, Long, Long)],
         state: GroupState[CusumState]) => {
          val (mu, sig) = baseline.getOrElse(tpe,
            throw new IllegalArgumentException(s"no CUSUM baseline for type $tpe"))
          var st = state.getOption.getOrElse(CusumState(0L, Long.MinValue))
          val rows = it.toArray.sortBy(_._2)
          val out = rows.map { case (_, dayMs, x) =>
            require(dayMs > st.lastDayMs,
              s"day $dayMs arrived at or before the folded high-water mark ${st.lastDayMs} for $tpe")
            val dq = math.floor(((x.toDouble - mu) - k * sig) * 1e6 + 0.5).toLong
            st = CusumState(math.max(0L, st.s + dq), dayMs)
            CusumRow(tpe, dayMs, x, st.s.toDouble / 1e6, st.s.toDouble / 1e6 > h * sig)
          }
          state.update(st)
          out.iterator
        })
  }

  case class CusumAdjRow(event_type: String, day_ms: Long, x: Long,
                         x_adj: Double, cusum: Double, flag: Boolean)

  /** Streaming twin of the DESEASONALIZED monitor's online half
    * (Anomaly.cusumDeseasonalFrom): same one-long fold as cusumStream,
    * but each arriving day first divides by its weekday's profile index
    * — with the profile AND the (μ, σ) baseline handed in as the fixed
    * offline calibration (the eval-set/centroid discipline: a profile
    * changing mid-stream would make the ledger a mix of two monitors).
    * The ISO weekday comes from epoch-day arithmetic ((days+3)%7+1 —
    * day 0 is a Thursday), the adjustment is the same single
    * floor(x/idx·10⁶+0.5) quantization as the batch column, and the
    * drift fold reuses the exact driftQ IEEE sequence. CusumStreamSpec
    * pins prefix equality at every micro-batch.
    */
  def cusumDeseasonalStream(daily: DataFrame,
                            profile: Map[(String, Int), Double],
                            baseline: Map[String, (Double, Double)],
                            k: Double = 0.5, h: Double = 4.0): Dataset[CusumAdjRow] = {
    import daily.sparkSession.implicits._
    daily
      .select(col("event_type").cast("string"), col("day_ms").cast("long"),
        col("x").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (tpe: String, it: Iterator[(String, Long, Long)],
         state: GroupState[CusumState]) => {
          val (mu, sig) = baseline.getOrElse(tpe,
            throw new IllegalArgumentException(s"no baseline for type $tpe"))
          var st = state.getOption.getOrElse(CusumState(0L, Long.MinValue))
          val rows = it.toArray.sortBy(_._2)
          val out = rows.map { case (_, dayMs, x) =>
            require(dayMs > st.lastDayMs,
              s"day $dayMs arrived at or before the folded high-water mark ${st.lastDayMs} for $tpe")
            // floorDiv/floorMod: plain / and % truncate toward zero, so a
            // pre-epoch day would yield dow <= 0 (self-review finding)
            val dow = (Math.floorMod(Math.floorDiv(dayMs, 86400000L) + 3, 7L) + 1).toInt
            val idx = profile.getOrElse((tpe, dow),
              throw new IllegalArgumentException(s"no profile for ($tpe, $dow)"))
            val xq = math.floor(x.toDouble / idx * 1e6 + 0.5).toLong
            val xa = xq.toDouble / 1e6
            val dq = math.floor(((xa - mu) - k * sig) * 1e6 + 0.5).toLong
            st = CusumState(math.max(0L, st.s + dq), dayMs)
            CusumAdjRow(tpe, dayMs, x, xa, st.s.toDouble / 1e6,
              st.s.toDouble / 1e6 > h * sig)
          }
          state.update(st)
          out.iterator
        })
  }
}
