package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-equality discipline for the streaming CUSUM monitor: after
  * every micro-batch, the stream's emitted statistics equal the batch
  * windows (Anomaly.cusumFrom) over exactly the days fed so far, with
  * the same offline baseline — and late/duplicate days are rejected
  * loudly, never silently folded.
  */
class CusumStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dayMs0 = 1700006400000L - 1700006400000L % 86400000L
  private def ms(day: Int): Long = dayMs0 + day * 86400000L

  test("stream fold equals the batch windows at every micro-batch prefix") {
    implicit val sqlCtx = spark.sqlContext
    val counts = Map(
      "view" -> Seq(10L, 12L, 8L, 11L, 30L, 31L, 29L, 9L),
      "click" -> Seq(5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L))
    val allDaily = counts.toSeq.flatMap { case (t, xs) =>
      xs.zipWithIndex.map { case (x, d) =>
        (t, new java.sql.Timestamp(ms(d)), x)
      }
    }.toDF("event_type", "day", "x")
    // offline calibration over the QUIET prefix (days 0–3) — the
    // deployment contract: calibrate before monitoring, so the drift
    // itself doesn't inflate σ and mute the alarm
    val baseDf = graft.operators.Anomaly.cusumBaseline(
      allDaily.filter(col("day") <= new java.sql.Timestamp(ms(3))))
    val base = baseDf.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

    val mem = MemoryStream[(String, Long, Long)]
    val out = graft.operators.Anomaly // just to anchor imports
    val ds = graft.streaming.EventStreams.cusumStream(
      mem.toDF.toDF("event_type", "day_ms", "x"), base)
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double, Boolean)]
    val q = ds.writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.EventStreams.CusumRow], _: Long) =>
          got ++= b.collect().map(r => (r.event_type, r.day_ms, r.cusum, r.flag))
          ()
      }.start()
    try {
      for (chunkDays <- Seq(0 to 2, 3 to 3, 4 to 7)) {
        mem.addData(chunkDays.flatMap(d =>
          counts.toSeq.map { case (t, xs) => (t, ms(d), xs(d)) }): _*)
        q.processAllAvailable()
        val fedDays = got.map(_._2).max
        val prefix = allDaily.filter(col("day") <= new java.sql.Timestamp(fedDays))
        val want = graft.operators.Anomaly.cusumFrom(prefix, baseDf)
          .collect()
          .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(3), r.getBoolean(4)))
          .sortBy(t => (t._1, t._2))
        assert(got.sortBy(t => (t._1, t._2)).toSeq == want.toSeq,
          s"stream diverged from batch after day ${fedDays}")
      }
      // the drifted type flagged, the flat type never
      assert(got.filter(_._1 == "view").count(_._4) >= 2)
      assert(!got.filter(_._1 == "click").exists(_._4))
    } finally q.stop()
  }

  test("a day at or before the high-water mark is rejected loudly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val ds = graft.streaming.EventStreams.cusumStream(
      mem.toDF.toDF("event_type", "day_ms", "x"),
      Map("view" -> ((10.0, 2.0))))
    val q = ds.writeStream.outputMode("append")
      .format("noop").start()
    try {
      mem.addData(("view", ms(5), 10L))
      q.processAllAvailable()
      mem.addData(("view", ms(5), 11L)) // duplicate day — must fail
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("high-water mark") ||
        Option(ex.getCause).exists(_.getMessage.contains("high-water mark")))
    } finally q.stop()
  }

  test("deseasonalized stream fold equals the batch monitor at every prefix; weekend dips stop alarming") {
    implicit val sqlCtx = spark.sqlContext
    // 14 days with a weekly pattern: weekdays ~20, weekends ~10; a real
    // level shift (+12) arrives in week 2. An unadjusted monitor would
    // see every weekend as drift; the adjusted one must flag only the
    // genuine shift.
    def weekly(d: Int): Long = { val dow = ((ms(d) / 86400000L + 3) % 7 + 1).toInt
      if (dow >= 6) 10L else 20L }
    val counts = (0 until 14).map(d => weekly(d) + (if (d >= 10) 12L else 0L))
    val allDaily = counts.zipWithIndex
      .map { case (x, d) => ("view", new java.sql.Timestamp(ms(d)), x) }
      .toSeq.toDF("event_type", "day", "x")
    // offline calibration on week 1 only (the pre-drift window)
    val calib = allDaily.filter(col("day") <= new java.sql.Timestamp(ms(6)))
    val idxDf = graft.operators.Anomaly.seasonalityFrom(calib)
      .select("event_type", "dow", "dow_index")
    val baseDf = graft.operators.Anomaly.deseasonalBaseline(
      graft.operators.Anomaly.deseasonalAdjusted(calib, idxDf))
    val profile = idxDf.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val base = baseDf.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

    val mem = MemoryStream[(String, Long, Long)]
    val ds = graft.streaming.EventStreams.cusumDeseasonalStream(
      mem.toDF.toDF("event_type", "day_ms", "x"), profile, base)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Double, Double, Boolean)]
    val q = ds.writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.EventStreams.CusumAdjRow], _: Long) =>
          got ++= b.collect().map(r => (r.event_type, r.day_ms, r.x_adj, r.cusum, r.flag))
          ()
      }.start()
    try {
      for (chunkDays <- Seq(0 to 4, 5 to 9, 10 to 13)) {
        mem.addData(chunkDays.map(d => ("view", ms(d), counts(d))): _*)
        q.processAllAvailable()
        val fedDays = got.map(_._2).max
        val prefix = allDaily.filter(col("day") <= new java.sql.Timestamp(fedDays))
        val want = graft.operators.Anomaly.cusumDeseasonalFrom(
            graft.operators.Anomaly.deseasonalAdjusted(prefix, idxDf), baseDf)
          .collect()
          .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(3),
            r.getDouble(4), r.getBoolean(5)))
          .sortBy(t => (t._1, t._2))
        assert(got.sortBy(t => (t._1, t._2)).toSeq == want.toSeq,
          s"deseasonalized stream diverged from batch after day $fedDays")
      }
      // week 1 (the seasonal-but-stationary window) never alarms;
      // the week-2 level shift does
      val flagsByDay = got.map(t => (t._2, t._5)).toMap
      assert((0 to 6).forall(d => !flagsByDay(ms(d))), "weekend dip false-alarmed")
      assert((10 to 13).exists(d => flagsByDay(ms(d))), "genuine level shift missed")
    } finally q.stop()
  }
}
