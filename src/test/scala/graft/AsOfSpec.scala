package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("joinBackward: latest right row at-or-before each left ts, per key") {
    import spark.implicits._
    val left = Seq( // (id, user, t)
      (100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 30L), (103L, 3L, 5L)
    ).toDF("id", "user", "t")
    val right = Seq( // (rid, user, t)
      (200L, 1L, 10L), (201L, 1L, 40L), (202L, 1L, 60L), (203L, 2L, 30L)
    ).toDF("rid", "user", "t")
      .select(col("user"), col("t"), col("rid"))
    val out = AsOf.joinBackward(left, right, "user", "t", "rid")
      .select(col("id"), col("_asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(201L)) // 40 <= 50, latest
    assert(out(101L).contains(200L)) // simultaneous right (t=10) matches
    assert(out(102L).contains(203L)) // exact ts match other key
    assert(out(103L).isEmpty)        // no right row for user 3 → left-outer null
  }

  test("joinBackward tie-break: simultaneous right rows resolved by tieBreak, last wins") {
    import spark.implicits._
    val left = Seq((1L, 1L, 20L)).toDF("id", "user", "t")
    val right = Seq((10L, 1L, 20L), (11L, 1L, 20L))
      .toDF("rid", "user", "t").select(col("user"), col("t"), col("rid"))
    val out = AsOf.joinBackward(left, right, "user", "t", "rid")
      .select(col("_asof.rid")).as[Long].collect()
    assert(out.toSeq == Seq(11L))
  }

  test("linear attribution: equal split, closed window bounds, cross-user isolation") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // user 1: clicks at t−25h (outside), t−24h (boundary, IN), t−1min (IN),
    // t (same instant, IN) → purchase of 9.0 splits 3.0 each
    // user 2: click after the purchase only → conversion unattributable
    val ev = Seq(
      (1L, ts(0), 1L, "click", 0.0),
      (2L, ts(60 * 1 - 25 * 60 + 1500), 1L, "noise", 0.0), // keep ids unique; ignored type
      (3L, ts(1500 - 25 * 60), 1L, "click", 0.0),          // t−25h: outside
      (4L, ts(1500 - 24 * 60), 1L, "click", 0.0),          // t−24h: boundary, in
      (5L, ts(1499), 1L, "click", 0.0),                    // in
      (6L, ts(1500), 1L, "click", 0.0),                    // same instant, in
      (7L, ts(1500), 1L, "purchase", 9.0),
      (8L, ts(1500), 2L, "purchase", 5.0),
      (9L, ts(1501), 2L, "click", 0.0))                    // after: out
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Attribution.linear(ev)
      .select("conv_event_id", "touch_event_id", "n_touches", "credit")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got == Seq((7L, 4L, 3L, 3.0), (7L, 5L, 3L, 3.0), (7L, 6L, 3L, 3.0)))
  }
}
