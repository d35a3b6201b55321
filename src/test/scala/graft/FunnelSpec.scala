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
}
