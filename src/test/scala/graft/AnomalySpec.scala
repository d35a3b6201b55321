package graft

import graft.operators.Anomaly
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Anomaly-family semantics: the prefix-min CUSUM closed form equals the
  * textbook recursion, a planted level shift is flagged after (and only
  * after) the shift, and the sigma rule flags exactly the planted spike.
  */
class AnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dayTs(day: Int) = // midnight UTC day offsets
    new java.sql.Timestamp(1700006400000L - 1700006400000L % 86400000L + day * 86400000L)

  /** counts-per-day fixture → one event row per unit of count. */
  private def series(counts: Seq[Int], tpe: String = "view") =
    counts.zipWithIndex.flatMap { case (c, day) =>
      (0 until c).map(i =>
        ((day * 1000 + i).toLong, dayTs(day), (i % 7).toLong, tpe, 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("prefix-min closed form equals the textbook clamped recursion") {
    val counts = Seq(10, 12, 8, 11, 9, 30, 31, 29, 33, 10)
    val out = Anomaly.cusum(series(counts), k = 0.5, h = 4.0)
      .orderBy("day").select("x", "cusum").as[(Long, Double)].collect()
    // replicate: μ, σ from exact integer moments, then the recursion
    val n = counts.length.toDouble
    val s1 = counts.map(_.toLong).sum.toDouble
    val s2 = counts.map(c => c.toLong * c).sum.toDouble
    val mu = s1 / n
    val sig = math.sqrt(math.max(s2 / n - (s1 / n) * (s1 / n), 0.0))
    var s = 0.0
    val want = counts.map { x =>
      val dq = math.floor(((x - mu) - 0.5 * sig) * 1e6 + 0.5) / 1e6
      s = math.max(0.0, s + dq); s
    }
    out.map(_._2).zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 1e-9, s"closed form $got vs recursion $w")
    }
  }

  test("a planted level shift is flagged after the shift, never before") {
    // 20 quiet days then a sustained jump — classic drift
    val counts = Seq.fill(20)(10) ++ Seq.fill(10)(25)
    val out = Anomaly.cusum(series(counts), k = 0.5, h = 4.0)
      .orderBy("day").select("flag").as[Boolean].collect()
    assert(!out.take(20).exists(identity), "false alarm in the quiet period")
    assert(out.drop(20).count(identity) >= 5, "sustained shift not caught")
  }

  test("ewma: constant series is a fixed point, a step converges geometrically") {
    val flat = Anomaly.ewma(series(Seq.fill(10)(12)))
      .orderBy("day").select("ewma", "dev").as[(Double, Double)].collect()
    assert(flat.forall { case (e, d) => e == 12.0 && d == 0.0 })
    // step 8 → 16 with α = 1/8: residual shrinks by 7/8 per day
    val step = Anomaly.ewma(series(Seq.fill(5)(8) ++ Seq.fill(10)(16)))
      .orderBy("day").select("ewma").as[Double].collect()
    val resid = step.drop(5).map(16.0 - _)
    assert(resid.head == 7.0) // 16 − (8 + (16−8)/8)
    resid.sliding(2).foreach { case Array(a, b) =>
      assert(b < a && b >= a * 0.85 - 1e-6, s"residuals $a → $b not ~7/8 decay")
    }
    assert(resid.last < 2.5, "EWMA failed to track the step")
  }

  test("botScore: a metronome user scores cv = 0, a bursty one does not") {
    val base = 1700000000000L
    val ev = ((0 until 20).map(i => // bot: exact 60 s clock
      (i.toLong, new java.sql.Timestamp(base + i * 60000L), 1L, "view", 1.0, "{}")) ++
      Seq(0L, 1000L, 2000L, 200000L, 201000L, 500000L).zipWithIndex.map { case (o, i) =>
        (100L + i, new java.sql.Timestamp(base + o), 2L, "view", 1.0, "{}")
      } :+ // a 2-event user has 1 gap — excluded by the n >= 2 bar
      (900L, new java.sql.Timestamp(base), 3L, "view", 1.0, "{}") :+
      (901L, new java.sql.Timestamp(base + 5000L), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Anomaly.botScore(ev).orderBy("user_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L), "the 1-gap user must be excluded")
    val bot = out.find(_._1 == 1L).get
    val human = out.find(_._1 == 2L).get
    assert(bot._3 == 0.0 && bot._4, s"metronome cv ${bot._3}")
    assert(human._3 > 0.3 && !human._4, s"bursty cv ${human._3}")
  }

  test("sigmaOutliers flags exactly the planted spike") {
    val ev = ((1 to 40).map(i => (i.toLong, dayTs(0), 1L, "view", 10.0 + (i % 3), "{}")) :+
      (99L, dayTs(0), 1L, "view", 500.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Anomaly.sigmaOutliers(ev, 3).select("event_id").as[Long].collect().toSeq
    assert(got == Seq(99L))
  }

  test("deseasonalAdjusted fails loudly on an unprofiled weekday — never silently drops the day") {
    // batch/stream contract parity: the streaming twin throws on a
    // missing (type, dow) profile row; an inner join here would instead
    // silently remove the day from the monitor (self-review finding)
    val base = 1700006400000L - 1700006400000L % 86400000L
    val daily = (0 until 9).map(d =>
        ("view", new java.sql.Timestamp(base + d * 86400000L), 10L + d))
      .toDF("event_type", "day", "x")
    // profile from a 7-day window: covers all weekdays — adjusts fine
    val idxFull = Anomaly.seasonalityFrom(daily.limit(7))
      .select("event_type", "dow", "dow_index")
    assert(Anomaly.deseasonalAdjusted(daily, idxFull).count() == 9)
    // profile from a 3-day window: days on uncovered weekdays must throw
    val idxShort = Anomaly.seasonalityFrom(daily.limit(3))
      .select("event_type", "dow", "dow_index")
    val ex = intercept[Exception] {
      Anomaly.deseasonalAdjusted(daily, idxShort).collect()
    }
    assert(ex.getMessage.contains("no seasonality profile") ||
      Option(ex.getCause).exists(_.getMessage.contains("no seasonality profile")))
  }
}
