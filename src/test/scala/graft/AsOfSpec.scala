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
}
