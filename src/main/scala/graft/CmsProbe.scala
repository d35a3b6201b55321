package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle economics of the Count-Min sketch vs the exact token count —
  * the measured basis for text_cms_sketch's scale claim (BASELINE.md
  * round-15 table). On a zipf corpus (the 200k-tail-word regime) both
  * jobs run over the same localCheckpointed token stream; a task-end
  * listener sums SHUFFLE WRITE records and bytes per job:
  *
  *   exact  — groupBy(token).count(): partial aggregation collapses
  *            repeats map-side, but every DISTINCT token in every
  *            partition still crosses the wire — the vocabulary-sized
  *            shuffle a 100 TB corpus cannot afford.
  *   cms    — Sketch.cmsSketch(d=4, w=256): the same partial-agg
  *            machinery collapses to ≤ d·w cells per partition, so the
  *            shuffle is CAPPED at d·w·P records of fixed-width ints no
  *            matter the vocabulary.
  *
  * `sbt "runMain graft.CmsProbe [nDocs]"` — default 50000 (the sf1.0
  * zipf regime). Prints one JSON line.
  */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.ZipfCorpus
      .synth(spark.range(n.toLong).select(col("id").as("doc_id")))
      .localCheckpoint()

    val recs = new java.util.concurrent.atomic.AtomicLong()
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val MarkerGroup = "cmsprobe-drain-marker"
    val markerJobs = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    @volatile var markerLatch: java.util.concurrent.CountDownLatch = null
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (j.properties != null &&
            MarkerGroup == j.properties.getProperty("spark.jobGroup.id"))
          markerJobs.add(j.jobId)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (markerJobs.remove(j.jobId) && markerLatch != null)
          markerLatch.countDown()
    })

    // The listener bus drains asynchronously, so after an action the
    // measured job's task-end events may still be in flight. The bus is
    // FIFO per queue: run a shuffle-free MARKER job and wait for ITS
    // job-end to be DELIVERED — every event posted before it (all the
    // measured task-ends) has then been delivered too. Deterministic,
    // public API only.
    def drainBus(): Unit = {
      markerLatch = new java.util.concurrent.CountDownLatch(1)
      spark.sparkContext.setJobGroup(MarkerGroup, "listener-bus drain marker")
      try spark.sparkContext.parallelize(Seq(1), 1).count()
      finally spark.sparkContext.clearJobGroup()
      require(markerLatch.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "listener bus failed to deliver the drain marker within 60s")
      markerLatch = null
    }

    def run(label: String)(f: => Long): String = {
      drainBus() // flush any straggler events from the PREVIOUS job
      recs.set(0); bytes.set(0)
      val t0 = System.nanoTime()
      val rows = f
      val wall = (System.nanoTime() - t0) / 1e9
      drainBus() // marker job itself is shuffle-free: adds 0 recs/bytes
      f"""\"$label\":{\"wall_s\":$wall%.2f,\"out_rows\":$rows,\"shuffle_recs\":${recs.get},\"shuffle_mb\":${bytes.get / 1048576.0}%.1f}"""
    }

    import graft.functions.TextOps
    def toks(src: org.apache.spark.sql.DataFrame) = src
      .select(explode(TextOps.splitWords(TextOps.normalize(col("text")))).as("token"))
      .filter(length(col("token")) > 0)
    val nTok = toks(docs).count()
    val nVocab = toks(docs).distinct().count()

    // both jobs tokenize from the same checkpointed docs — the compared
    // cost is the aggregation shuffle, the shared scan is identical
    val rExact = run("exact")(toks(docs).groupBy("token").count().count())
    val rCms = run("cms")(graft.operators.Sketch.cmsSketch(docs, 4, 256).count())
    println(s"""{"n_docs":$n,"n_tokens":$nTok,"n_vocab":$nVocab,$rExact,$rCms}""")
    spark.stop()
  }
}
