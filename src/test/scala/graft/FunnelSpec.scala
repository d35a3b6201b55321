package graft

import graft.operators.Funnel
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)

  def events = {
    import spark.implicits._
    Seq(
      // user 1 completes the funnel in order
      (1L, "signup", ts(1)), (1L, "view", ts(2)), (1L, "click", ts(3)), (1L, "purchase", ts(4)),
      // user 2's view came BEFORE signup — never reaches stage 2
      (2L, "view", ts(1)), (2L, "signup", ts(2)), (2L, "click", ts(3)),
      // user 3 skips click — stalls at stage 2 (purchase can't count)
      (3L, "signup", ts(1)), (3L, "view", ts(2)), (3L, "purchase", ts(3)),
      // user 4's view is simultaneous with signup — strictness stalls at 1
      (4L, "signup", ts(1)), (4L, "view", ts(1)),
      // user 1 noise: a second, later view must not shift first-touch
      (1L, "view", ts(9))
    ).toDF("user_id", "event_type", "ts")
  }

  val steps = Seq("signup", "view", "click", "purchase")

  test("conversion: strict order, strict inequality, first-touch per stage") {
    import spark.implicits._
    val r = Funnel.conversion(events, steps)
      .as[(Int, String, Long)].collect().toSeq
    assert(r == Seq((1, "signup", 4L), (2, "view", 2L), (3, "click", 1L), (4, "purchase", 1L)))
  }

  test("completedUsers: only the in-order completer, with the final first-touch ts") {
    import spark.implicits._
    val r = Funnel.completedUsers(events, steps)
      .as[(Long, java.sql.Timestamp)].collect().toSeq
    assert(r == Seq((1L, ts(4))))
  }

  def slowEvents = {
    import spark.implicits._
    Seq(
      // user 1: every transition within 2 s — completes under a 2 s bound
      (1L, "signup", ts(1)), (1L, "view", ts(2)), (1L, "click", ts(4)), (1L, "purchase", ts(6)),
      // user 2: click comes 10 s after view — bounded funnel stalls at 2;
      // the unbounded funnel still counts it (and the later purchase)
      (2L, "signup", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(12)), (2L, "purchase", ts(13)),
      // user 3: a too-late view (ts 9) then nothing — horizon kills stage 2
      (3L, "signup", ts(1)), (3L, "view", ts(9))
    ).toDF("user_id", "event_type", "ts")
  }

  test("conversionTiming: integer-ms avg/max per transition, horizon composes") {
    import spark.implicits._
    // user 1: view +1s, click +2s, purchase +2s; user 2 stalls after view
    // (from slowEvents: u1 deltas 1s/2s/2s, u2 view +1s then click +10s)
    val t = Funnel.conversionTiming(slowEvents, steps)
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    // stage 2 (view): u1 +1000ms, u2 +1000ms, u3 +8000ms → avg 3333, max 8000
    assert(t.head == ((2, "view", 3L, 3333L, 8000L)))
    // stage 3 (click): u1 +2000, u2 +10000 → avg 6000, max 10000
    assert(t(1) == ((3, "click", 2L, 6000L, 10000L)))
    // stage 4 (purchase): u1 +2000, u2 +1000 → avg 1500, max 2000
    assert(t(2) == ((4, "purchase", 2L, 1500L, 2000L)))
    // with a 2s horizon the late transitions drop out of the timing too
    val tw = Funnel.conversionTiming(slowEvents, steps,
      within = Some(org.apache.spark.sql.functions.expr("INTERVAL 2 SECONDS")))
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(tw.head._3 == 2L && tw.head._5 <= 2000L) // only in-horizon views
  }

  test("conversion with `within`: a transition past the horizon stops the chain") {
    import spark.implicits._
    val bounded = Funnel.conversion(slowEvents, steps,
      within = Some(org.apache.spark.sql.functions.expr("INTERVAL 2 SECONDS")))
      .as[(Int, String, Long)].collect().toSeq
    assert(bounded == Seq((1, "signup", 3L), (2, "view", 2L), (3, "click", 1L), (4, "purchase", 1L)))
    val unbounded = Funnel.conversion(slowEvents, steps)
      .as[(Int, String, Long)].collect().toSeq
    assert(unbounded == Seq((1, "signup", 3L), (2, "view", 3L), (3, "click", 2L), (4, "purchase", 2L)))
    // horizon bounds the NEXT transition from the previous stage's first
    // touch — user 2's purchase is 1 s after its click, but the click
    // itself was out of horizon, so neither counts
    val cu = Funnel.completedUsers(slowEvents, steps,
      within = Some(org.apache.spark.sql.functions.expr("INTERVAL 2 SECONDS")))
      .as[(Long, java.sql.Timestamp)].collect().toSeq
    assert(cu == Seq((1L, ts(6))))
  }

  test("conversionCi: Wilson interval brackets the rate, matches the textbook numbers") {
    import spark.implicits._
    // 100 users sign up, exactly 50 view afterwards: p̂ = 0.5, n = 100 →
    // the Wilson 95% interval is [0.40383, 0.59617] (textbook value)
    val ev = ((1 to 100).map(u =>
      (u.toLong, ts(0), u.toLong, "signup", 1.0, "{}")) ++
      (1 to 50).map(u => (1000L + u, ts(10), u.toLong, "view", 1.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Funnel.conversionCi(ev, Seq("signup", "view")).collect()
    assert(out.length == 1)
    val r = out(0)
    val (n, nNext) = (r.getLong(3), r.getLong(4))
    val (rate, lo, hi) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert((n, nNext) == ((100L, 50L)))
    assert(rate == 0.5)
    assert(lo >= 0.0 && lo <= rate && rate <= hi && hi <= 1.0)
    assert(math.abs(lo - 0.40383) < 5e-4 && math.abs(hi - 0.59617) < 5e-4,
      s"[$lo, $hi] vs the textbook Wilson interval")
    // degenerate p̂ = 1 stays inside [0, 1] (the Wald band would not)
    val all = ((1 to 20).map(u => (u.toLong, ts(0), u.toLong, "signup", 1.0, "{}")) ++
      (1 to 20).map(u => (100L + u, ts(10), u.toLong, "view", 1.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = Funnel.conversionCi(all, Seq("signup", "view")).collect()(0)
    assert(r2.getDouble(5) == 1.0 && r2.getDouble(7) <= 1.0 && r2.getDouble(6) < 1.0)
  }
}
