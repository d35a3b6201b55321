package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decision-level coverage for the RFM quantiles and the DAU/WAU explode
  * shape: the histogram-quintile rule at its boundaries (ties share a
  * bucket, monotone metric→bucket), and the trailing-window identity the
  * explode form must reproduce against a naive per-day recount.
  */
class EngagementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("rfm: histogram quintiles are monotone, tie-sharing, and exact") {
    // 10 users, frequency metric = 1..10 distinct → f_q = ceil(5*rank/10):
    // users with n_events 1,2 → 1; 3,4 → 2; ...; 9,10 → 5
    val ev = (1 to 10).flatMap(u => (1 to u).map(i =>
      (u * 100L + i, ts(i), u.toLong, "click", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.operators.Rfm.segments(ev)
      .select("user_id", "n_events", "f_q")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(_._3).toSeq == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 5L, 5L))
    // monotone in the metric
    assert(r.sortBy(_._2).map(_._3).toSeq == r.sortBy(_._2).map(_._3).sorted.toSeq)
    // ties share a bucket: all users with the SAME monetary total (equal
    // per-event value × n differs; craft equal totals instead)
    val tied = Seq(
      (1L, ts(0), 1L, "a", 6.0), (2L, ts(0), 2L, "a", 3.0), (3L, ts(1), 2L, "a", 3.0),
      (4L, ts(0), 3L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = graft.operators.Rfm.segments(tied)
      .select("user_id", "m_q").as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L), "equal monetary totals must land in one bucket")
    assert(m(3L) < m(1L))
  }

  test("dau/wau: explode form equals the naive trailing-7 recount, wau >= dau") {
    // users active across 10 days with gaps
    val rows = for {
      u <- 1L to 5L
      d <- Seq(0L, 1L, 3L, 7L, 9L) if (u + d) % 3 != 0
    } yield (u * 1000 + d, ts(d * 1440), u, "view", 0.0)
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Engagement.dauWau(ev)
      .select("day", "dau", "wau")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // naive recount on the driver
    val ud = rows.map(r => (r._3, 1700000000000L / 86400000L +
      (r._1 % 1000))).distinct // (user, epoch-day); event_id % 1000 = d
    val days = ud.map(_._2).distinct.sorted
    for (d <- days) {
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(x => x._2 <= d && x._2 >= d - 6).map(_._1).distinct.size.toLong
      assert(got(d) == ((dau, wau)), s"day $d mismatch")
      assert(wau >= dau)
    }
    assert(got.keySet == days.toSet, "only active days emit rows")
  }

  test("markov: transition counts, row-normalized probs, ts-tie by event_id") {
    // user 1: a -> b -> b -> c ; user 2: a -> c (tie at t=0 broken by
    // event_id: 20 before 21) ; user 3: single event -> no transition
    val ev = Seq(
      (10L, ts(0), 1L, "a", 0.0), (11L, ts(1), 1L, "b", 0.0),
      (12L, ts(2), 1L, "b", 0.0), (13L, ts(3), 1L, "c", 0.0),
      (20L, ts(0), 2L, "a", 0.0), (21L, ts(0), 2L, "c", 0.0),
      (30L, ts(5), 3L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Paths.markov(ev)
      .select("cur", "nxt", "n", "p")
      .as[(String, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "b") -> ((1L, 0.5)), ("b", "c") -> ((1L, 0.5))))
    // each row's probabilities sum to 1
    got.groupBy(_._1._1).foreach { case (_, m) =>
      assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-9)
    }
  }

  test("stationary: converges to the analytic fixed point, dangling mass renormalized") {
    // matrix from the markov fixture: a->b .5, a->c .5, b->b .5, b->c .5;
    // c is dangling (no outgoing), a is never a target. Analytically the
    // renormalized power iteration reaches (a,b,c) = (0, .5, .5) after two
    // steps and stays there (all values exact at stab(6)).
    val ev = Seq(
      (10L, ts(0), 1L, "a", 0.0), (11L, ts(1), 1L, "b", 0.0),
      (12L, ts(2), 1L, "b", 0.0), (13L, ts(3), 1L, "c", 0.0),
      (20L, ts(0), 2L, "a", 0.0), (21L, ts(0), 2L, "c", 0.0),
      (30L, ts(5), 3L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val pi = graft.operators.Paths.stationary(ev)
      .as[(String, Double)].collect().toMap
    assert(pi == Map("a" -> 0.0, "b" -> 0.5, "c" -> 0.5))
  }

  test("stationary: invariants and agreement with an unquantized reference") {
    // asymmetric chain: a->b twice, b->a once, b->c once, c->a twice.
    // P = a:{b:1}, b:{a:.5, c:.5}, c:{a:1} — irreducible, so pi solves
    // pi = pi P: pi(a)=pi(b)/2+pi(c), pi(b)=pi(a), pi(c)=pi(b)/2
    // → (.4, .4, .2).
    val ev = Seq(
      (1L, ts(0), 1L, "a", 0.0), (2L, ts(1), 1L, "b", 0.0),
      (3L, ts(2), 1L, "a", 0.0), (4L, ts(3), 1L, "b", 0.0),
      (5L, ts(4), 1L, "c", 0.0), (6L, ts(5), 1L, "a", 0.0),
      (7L, ts(0), 2L, "c", 0.0), (8L, ts(1), 2L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val pi = graft.operators.Paths.stationary(ev)
      .as[(String, Double)].collect().toMap
    assert(pi.keySet == Set("a", "b", "c"))
    assert(pi.values.forall(p => p >= 0.0 && p <= 1.0))
    assert(math.abs(pi.values.sum - 1.0) < 5e-6, s"mass not conserved: $pi")
    // 24 rounds at mixing rate ~0.63 + stab(6) drift: within 1e-4
    assert(math.abs(pi("a") - 0.4) < 1e-4, s"pi=$pi")
    assert(math.abs(pi("b") - 0.4) < 1e-4, s"pi=$pi")
    assert(math.abs(pi("c") - 0.2) < 1e-4, s"pi=$pi")
  }

  test("kaplanMeier: uncensored curve equals the empirical fraction; censoring hand-checked") {
    import org.apache.spark.sql.functions._
    def ev(rows: Seq[(Long, Int, String)]) = rows.zipWithIndex.map {
      case ((u, day, t), i) =>
        (i.toLong, new java.sql.Timestamp(1700006400000L -
          1700006400000L % 86400000L + day * 86400000L), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // 5 users signup day 0; conversions at days 1,1,2,3; user 5 never
    // converts (censored at the stream max = day 3)
    val rows = (1L to 5L).map(u => (u, 0, "signup")) ++
      Seq((1L, 1, "purchase"), (2L, 1, "purchase"), (3L, 2, "purchase"), (4L, 3, "purchase"))
    val km = graft.operators.Survival.kaplanMeier(ev(rows))
      .orderBy("t").select("t", "n_at_risk", "n_converted", "ln_s")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // step 1: n=5, d=2 → S=3/5; step 2: n=3, d=1 → S=3/5·2/3=2/5;
    // step 3: n=2 (user 5 censored AT day 3 still at risk), d=1 → S=1/5
    assert(km.map(r => (r._1, r._2, r._3)) == Seq((1L, 5L, 2L), (2L, 3L, 1L), (3L, 2L, 1L)))
    val s = km.map(r => math.exp(r._4))
    Seq(0.6, 0.4, 0.2).zip(s).foreach { case (want, got) =>
      assert(math.abs(got - want) < 1e-4, s"S=$got want $want")
    }
    // a terminal d = n step (everyone converts) is dropped, earlier kept
    val all = (1L to 3L).map(u => (u, 0, "signup")) ++
      Seq((1L, 1, "purchase"), (2L, 2, "purchase"), (3L, 2, "purchase"))
    val km2 = graft.operators.Survival.kaplanMeier(ev(all))
      .orderBy("t").select("t").as[Long].collect().toSeq
    assert(km2 == Seq(1L), s"terminal-zero step must drop, got $km2")
  }

  test("cooccurPmi: hand-counted incidence, signs, and the n_ab <= min bound") {
    // one session per user (all events within the gap): sessions
    // u1={A,B}, u2={A,B}, u3={A}, u4={B}, u5={C,D}, u6={C,D} → N=6;
    // n_AB=2, n_A=3, n_B=3 → pmi=ln(12/9)>0; n_CD=2=n_C=n_D → ln(6/2)
    val rows = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (4L, "B"),
      (5L, "C"), (5L, "D"), (6L, "C"), (6L, "D")
    ).zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, ts(i % 2), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.Affinity.cooccurPmi(rows, 30)
      .orderBy("type_a", "type_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._4, r._5)) ==
      Seq(("A", "B", 2L, 3L, 3L), ("C", "D", 2L, 2L, 2L)))
    val pmi = out.map(r => ((r._1, r._2), r._6)).toMap
    assert(math.abs(pmi(("A", "B")) - math.log(12.0 / 9.0)) < 1e-5)
    assert(math.abs(pmi(("C", "D")) - math.log(3.0)) < 1e-5)
    assert(out.forall(r => r._3 <= math.min(r._4, r._5)))
  }
}
