package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Registered skew-tooling proof at the decade scale (round-15 verdict
  * #8): measures AQE skew-join handling on the sf1.0-sized zipf head —
  * the 50k-doc corpus whose hottest token owns ~26 % of a ~7.5 M-row
  * token table — as TASK-TIME SPREAD, not just wall-clock. Three
  * variants of the same forced sort-merge join (broadcast disabled — at
  * 100 TB the dimension side of a skewed join is not always
  * broadcastable) + per-word aggregate:
  *
  *   off    — AQE skew-join disabled: the hot key rides ONE task.
  *   aqe    — AQE skew-join enabled (thresholds lowered to trigger at
  *            this fixture's ~100 MB hot partition; the 256 MB defaults
  *            are sized for production shuffles and would pass it by).
  *   salted — Skew.saltedJoin(salt=16): the logical-plan fix, hot key
  *            pre-split 16 ways, no AQE assistance needed.
  *
  * Prints one JSON line with per-variant wall-clock, join-stage task
  * count, max/median task ms, and the row-identical result checksum.
  * Results recorded in BASELINE.md.
  *
  * `sbt "runMain graft.SkewDecade [nDocs]"` — default 50000 (the sf1.0
  * zipf regime).
  */
object SkewDecade {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.ZipfCorpus
      .synth(spark.range(n.toLong).select(col("id").as("doc_id")))
    val toks = graft.operators.Search.tokens(docs).localCheckpoint()
    // per-word attribute side: tiny, but NOT broadcast (see scaladoc) —
    // the join is a genuine shuffle join on the zipf-skewed word key
    val attrs = toks.groupBy("word").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val nToks = toks.count()
    val head = toks.groupBy("word").count().orderBy(desc("count")).first()
    System.err.println(s"[skewdecade] $nToks tokens, head '${head.getString(0)}' = ${head.getLong(1)}")

    val durs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        durs.add(t.taskInfo.duration)
    })

    def run(label: String, skewJoin: Boolean, salted: Boolean): (String, Double, Int, Long, Long, Long) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      durs.clear()
      val t0 = System.nanoTime()
      val joined =
        if (salted) graft.operators.Skew.saltedJoin(toks, attrs, "word", 16,
          Seq(col("doc_id"), col("word")))
        else toks.join(attrs, "word")
      // mod before summing: an ANSI Long sum of raw xxhash64 values
      // overflows; 7.5M values < 1e9 sum to ~7.5e15, comfortably in Long
      val chk = joined.agg(sum(pmod(
          xxhash64(col("word"), col("doc_id"), col("df")), lit(1000000007L))))
        .collect()(0).getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      val ds = {
        val a = new Array[Long](durs.size())
        var i = 0
        val it = durs.iterator()
        while (it.hasNext) { a(i) = it.next(); i += 1 }
        java.util.Arrays.sort(a)
        a
      }
      (label, wall, ds.length, ds.last, ds(ds.length / 2), chk)
    }

    // warm once (codegen, checkpoint reads)
    run("warm", skewJoin = false, salted = false)
    val rs = Seq(
      run("off", skewJoin = false, salted = false),
      run("aqe", skewJoin = true, salted = false),
      run("salted", skewJoin = true, salted = true))
    require(rs.map(_._6).distinct.size == 1,
      s"variants disagree on checksum: $rs")
    def bodyOf(xs: Seq[(String, Double, Int, Long, Long, Long)]) =
      xs.map { case (l, w, nt, mx, md, _) =>
        f""""$l":{"wall":$w%.2f,"n_tasks":$nt,"max_task_ms":$mx,"p50_task_ms":$md}"""
      }.mkString(",")

    // Second dataset: the DEGENERATE crawl FK — one domain owning 30 %
    // of a 20M-row fact table (the regime AQE skew-join exists for; the
    // corpus-derived token join above has only a 3.8 % head, which hash
    // partitioning absorbs). Deterministic synthesis, forced SMJ.
    val fact = spark.range(20000000L).select(
        when(pmod(col("id"), lit(10L)) < 3, 0L)
          .otherwise(pmod(col("id") * 2654435761L, lit(1000L))).as("key"),
        col("id").as("v"))
      .localCheckpoint()
    val dim = spark.range(1000L).select(col("id").as("key"),
        (col("id") * 7L).as("attr"))
      .localCheckpoint()
    def runDeg(label: String, skewJoin: Boolean, salted: Boolean): (String, Double, Int, Long, Long, Long) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      durs.clear()
      val t0 = System.nanoTime()
      val joined =
        if (salted) graft.operators.Skew.saltedJoin(fact, dim, "key", 16, Seq(col("v")))
        else fact.join(dim, "key")
      val chk = joined.agg(sum(pmod(xxhash64(col("key"), col("v"), col("attr")),
          lit(1000000007L)))).collect()(0).getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      val a = new Array[Long](durs.size())
      var i = 0
      val it = durs.iterator()
      while (it.hasNext) { a(i) = it.next(); i += 1 }
      java.util.Arrays.sort(a)
      (label, wall, a.length, a.last, a(a.length / 2), chk)
    }
    runDeg("warm", skewJoin = false, salted = false)
    val rd = Seq(
      runDeg("off", skewJoin = false, salted = false),
      runDeg("aqe", skewJoin = true, salted = false),
      runDeg("salted", skewJoin = true, salted = true))
    require(rd.map(_._6).distinct.size == 1,
      s"degenerate variants disagree: $rd")
    println(s"""{"zipf_head":{"n_docs":$n,"n_tokens":$nToks,"head_count":${head.getLong(1)},${bodyOf(rs)}},""" +
      s""""degenerate_fk":{"n_rows":20000000,"head_pct":30,${bodyOf(rd)}}}""")
    spark.stop()
  }
}
