package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming Markov adjacency twin: the pair stream emitted so far
  * must always equal the batch `Paths.transitionPairs` over the settled
  * prefix (successor at-or-below the watermark) — at every
  * micro-batch, under cross-batch reordering inside the horizon — and
  * each pair must emit exactly once.
  */
class TransitionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  private def batchPairs(evs: Seq[EventStreams.Ev]): Set[(Long, Long, Long, String, String)] = {
    import spark.implicits._
    graft.operators.Paths.transitionPairs(
      evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type))
        .toDF("event_id", "ts", "user_id", "event_type"))
      .as[(Long, Long, Long, String, String)].collect().toSet
  }

  test("transitions: prefix-equal to the batch pair set at every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    val q = EventStreams.transitionsEventTime(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_out").start()
    def got() = spark.table("trans_out")
      .as[EventStreams.TransitionOut].collect()
      .map(t => (t.user_id, t.cur_id, t.nxt_id, t.cur, t.nxt))
    try {
      // user 7's chain a->b->c->d delivered OUT OF ORDER across batches
      // (b after c), all inside the 10-min watermark delay; user 99 is
      // the watermark driver.
      val e = Map(
        1L -> EventStreams.Ev(1L, ts(0), 7L, "a", 0.0),
        3L -> EventStreams.Ev(3L, ts(2), 7L, "c", 0.0),
        2L -> EventStreams.Ev(2L, ts(1), 7L, "b", 0.0),
        4L -> EventStreams.Ev(4L, ts(3), 7L, "d", 0.0))
      val delivered = scala.collection.mutable.ArrayBuffer.empty[EventStreams.Ev]
      var wmMin = Long.MinValue // watermark in minutes (max seen - 10)
      def push(ev: EventStreams.Ev): Unit = {
        mem.addData(ev); delivered += ev
        q.processAllAvailable()
        wmMin = math.max(wmMin, (ev.ts.getTime - 1700000000000L) / 60000L - 10)
        // settled prefix = events at-or-below the watermark
        val settled = delivered.filter(d =>
          (d.ts.getTime - 1700000000000L) / 60000L <= wmMin)
        val want = batchPairs(settled.toSeq)
        val g = got()
        assert(g.toSet == want, s"after event ${ev.event_id}")
        assert(g.length == g.toSet.size, "a pair emitted twice")
      }
      push(e(1L)); push(e(3L)); push(e(2L)); push(e(4L))
      // advance the watermark past the whole chain: all 3 pairs final
      push(EventStreams.Ev(900L, ts(100), 99L, "x", 0.0))
      push(EventStreams.Ev(901L, ts(101), 99L, "x", 0.0))
      val fin = got().filter(_._1 == 7L).sortBy(_._2)
      assert(fin.toSeq == Seq(
        (7L, 1L, 2L, "a", "b"), (7L, 2L, 3L, "b", "c"), (7L, 3L, 4L, "c", "d")))
      // exactly-once across the whole run, both users
      val all = got()
      assert(all.length == all.toSet.size)
    } finally q.stop()
  }

  test("transitions: the at-watermark boundary is safe — ties cannot arrive") {
    // The <= settlement rule is sound only if no arrival can ever tie
    // with a settled successor at equal ts. This pins the engine
    // behavior that guarantees it: flatMapGroupsWithState's late-event
    // filter drops rows at-or-below the watermark before they reach the
    // operator. If a Spark upgrade ever relaxed the boundary to
    // strictly-below, this test fails and the settlement rule must move
    // to strict <.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    val q = EventStreams.transitionsEventTime(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_tie_out").start()
    try {
      mem.addData(EventStreams.Ev(1L, ts(0), 5L, "a", 0.0))
      mem.addData(EventStreams.Ev(3L, ts(1), 5L, "b", 0.0))
      // push the watermark EXACTLY onto ts(1): wm = ts(11) - 10 min
      mem.addData(EventStreams.Ev(900L, ts(11), 99L, "x", 0.0))
      q.processAllAvailable()
      // successor b sits AT the watermark → settled under <=, pair final
      val mid = spark.table("trans_tie_out")
        .as[EventStreams.TransitionOut].collect()
        .filter(_.user_id == 5L).map(t => (t.cur_id, t.nxt_id))
      assert(mid.toSeq == Seq((1L, 3L)), "at-watermark successor must settle")
      // an equal-ts smaller-id row arrives late: the engine drops it at
      // the late-event filter, so the settled pair cannot be invalidated
      mem.addData(EventStreams.Ev(2L, ts(1), 5L, "c", 0.0))
      mem.addData(EventStreams.Ev(901L, ts(100), 99L, "x", 0.0))
      q.processAllAvailable()
      val fin = spark.table("trans_tie_out")
        .as[EventStreams.TransitionOut].collect()
        .filter(_.user_id == 5L).map(t => (t.cur_id, t.nxt_id, t.cur, t.nxt))
      assert(fin.toSeq == Seq((1L, 3L, "a", "b")),
        "the at-watermark tie row must have been dropped by the engine")
    } finally q.stop()
  }
}
