package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-equality discipline for the streaming EWMA baseline: after
  * every micro-batch, the emitted (ewma, dev) sequence equals the batch
  * fold (Anomaly.ewma) over exactly the days fed so far.
  */
class EwmaStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dayMs0 = 1700006400000L - 1700006400000L % 86400000L
  private def ms(day: Int): Long = dayMs0 + day * 86400000L

  private def eventsFor(counts: Map[String, Seq[Long]], days: Range) =
    counts.toSeq.flatMap { case (t, xs) =>
      days.flatMap(d => (0 until xs(d).toInt).map(i =>
        ((d * 10000 + i).toLong, new java.sql.Timestamp(ms(d) + i),
          (i % 5).toLong, t, 1.0, "{}")))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("stream fold equals the batch fold at every micro-batch prefix") {
    implicit val sqlCtx = spark.sqlContext
    val counts = Map(
      "view" -> Seq(10L, 14L, 9L, 16L, 30L, 28L, 7L, 12L),
      "click" -> Seq(3L, 3L, 3L, 3L, 3L, 3L, 3L, 3L))
    val mem = MemoryStream[(String, Long, Long)]
    val ds = graft.streaming.EventStreams.ewmaStream(
      mem.toDF.toDF("event_type", "day_ms", "x"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double, Double)]
    val q = ds.writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.EventStreams.EwmaRow], _: Long) =>
          got ++= b.collect().map(r => (r.event_type, r.day_ms, r.ewma, r.dev))
          ()
      }.start()
    try {
      var fedThrough = -1
      for (chunkDays <- Seq(0 to 1, 2 to 4, 5 to 7)) {
        mem.addData(chunkDays.flatMap(d =>
          counts.toSeq.map { case (t, xs) => (t, ms(d), xs(d)) }): _*)
        q.processAllAvailable()
        fedThrough = chunkDays.end
        val want = graft.operators.Anomaly.ewma(
            eventsFor(counts, 0 to fedThrough))
          .collect()
          .map(r => (r.getString(0), r.getTimestamp(1).getTime,
            r.getDouble(3), r.getDouble(4)))
          .sortBy(t => (t._1, t._2))
        assert(got.sortBy(t => (t._1, t._2)).toSeq == want.toSeq,
          s"stream diverged from batch after day $fedThrough")
      }
    } finally q.stop()
  }
}
