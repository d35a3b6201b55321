package graft

// Scratch measurement main for round 19 (deleted before round close):
// times the text_curate composite's branches in isolation to locate the
// CPU hog the profile showed (18.5 CPU-s for a plan whose parts measure
// < 3 CPU-s standalone).
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

object R19Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskNanos = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
    })
    import graft.functions.TextOps
    import graft.operators.{Spread, TextAnalysis}
    def docsRaw = graft.sources.Tables.documents(spark, sfDir)
    def docsSp = Spread(graft.sources.Tables.documents(spark, sfDir))

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warm
      val best = (1 to 3).map { _ =>
        Thread.sleep(200); taskNanos.set(0)
        val t0 = System.nanoTime()
        mk.count()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        (w, taskNanos.get / 1e9)
      }.minBy(_._1)
      println(f"PROBE $name%-28s wall=${best._1}%7.3f taskTime=${best._2}%8.3f")
    }

    // the curate signals projection, verbatim
    def signals(docs: org.apache.spark.sql.DataFrame) = {
      val arrAll = TextOps.splitWords(TextOps.normalize(col("text")))
      val base = docs
        .filter(col("doc_id") >= 10)
        .select(col("doc_id"), arrAll.as("aa"))
        .withColumn("ak", filter(col("aa"), w => TextOps.isKeptToken(w)))
      val nK = size(col("ak"))
      val nKd = nK.cast("double")
      val stopwordRatio =
        size(filter(col("ak"), w => w.isin(TextAnalysis.Stopwords: _*))).cast("double") / nKd
      val digitRatio = size(filter(col("ak"), w => w.rlike("[0-9]"))).cast("double") / nKd
      val ttr = size(array_distinct(col("ak"))).cast("double") / nKd
      val quality = least(lit(1.0), nKd / lit(50.0)) * ttr * (lit(1.0) - digitRatio)
      val m = size(col("aa")) - 2
      val grams = (1 until 3).foldLeft(slice(col("aa"), lit(1), m)) { (acc, k) =>
        zip_with(acc, slice(col("aa"), lit(k + 1), m), (a, b) => concat_ws(" ", a, b))
      }
      base
        .filter(size(col("aa")) >= 3)
        .select(col("doc_id"), nK.cast("long").as("n_tokens"),
          quality.as("quality"), stopwordRatio.as("stopword_ratio"),
          grams.as("g"))
        .withColumn("rep_ratio",
          lit(1.0) - size(array_distinct(col("g"))).cast("double") / size(col("g")))
        .filter(col("n_tokens") >= 30 && col("quality") >= 0.32 &&
          col("stopword_ratio") >= 0.02)
        .filter(col("rep_ratio") <= 0.05)
        .select("doc_id", "n_tokens", "quality", "rep_ratio")
    }

    // narrowed variants: which term of the signals projection is hot?
    def sigParts(docs: org.apache.spark.sql.DataFrame, withRep: Boolean,
                 withClean: Boolean) = {
      val arrAll = TextOps.splitWords(TextOps.normalize(col("text")))
      val base = docs
        .filter(col("doc_id") >= 10)
        .select(col("doc_id"), arrAll.as("aa"))
        .withColumn("ak", filter(col("aa"), w => TextOps.isKeptToken(w)))
      val nK = size(col("ak"))
      val nKd = nK.cast("double")
      val stopwordRatio =
        size(filter(col("ak"), w => w.isin(TextAnalysis.Stopwords: _*))).cast("double") / nKd
      val digitRatio = size(filter(col("ak"), w => w.rlike("[0-9]"))).cast("double") / nKd
      val ttr = size(array_distinct(col("ak"))).cast("double") / nKd
      val quality = least(lit(1.0), nKd / lit(50.0)) * ttr * (lit(1.0) - digitRatio)
      val m = size(col("aa")) - 2
      val grams = (1 until 3).foldLeft(slice(col("aa"), lit(1), m)) { (acc, k) =>
        zip_with(acc, slice(col("aa"), lit(k + 1), m), (a, b) => concat_ws(" ", a, b))
      }
      val cleanCols = if (withClean)
        Seq(nK.cast("long").as("n_tokens"), quality.as("quality"),
          stopwordRatio.as("stopword_ratio"))
      else Seq(nK.cast("long").as("n_tokens"))
      val repCols = if (withRep) Seq(grams.as("g")) else Seq()
      val sel = base.filter(size(col("aa")) >= 3)
        .select((col("doc_id") +: (cleanCols ++ repCols)): _*)
      if (withRep) sel.withColumn("rep_ratio",
        lit(1.0) - size(array_distinct(col("g"))).cast("double") / size(col("g")))
        .drop("g")
      else sel
    }
    time("sig: tokenize+size only")(sigParts(docsSp, withRep = false, withClean = false))
    time("sig: clean only")(sigParts(docsSp, withRep = false, withClean = true))
    time("sig: rep only")(sigParts(docsSp, withRep = true, withClean = false))
    time("signals(spread)")(signals(docsSp))
    time("signals(raw)")(signals(docsRaw))
    time("nll(spread)")(TextAnalysis.bigramNllFrom(
      TextAnalysis.bigramStream(docsSp),
      graft.queries.TextAnalysisQueries.persistedBigramLm(spark, sfDir)))
    time("nll(raw)")(TextAnalysis.bigramNllFrom(
      TextAnalysis.bigramStream(docsRaw),
      graft.queries.TextAnalysisQueries.persistedBigramLm(spark, sfDir)))
    time("contam")(graft.queries.DedupQueries.persistedShingles(spark, sfDir)
      .filter(col("doc_id") >= 10)
      .join(broadcast(graft.queries.DedupQueries.persistedShingles(spark, sfDir)
        .filter(col("doc_id") < 10).select("shingle").distinct()), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
      .filter(col("n_contaminated") > 4))
    time("pairs+clusters")(graft.operators.Dedup.clusters(
      graft.queries.DedupQueries.lshKeepPairs(spark, sfDir)))
    time("cleanCorpus(raw, old)")(TextAnalysis.cleanCorpus(docsRaw))
    time("repetition(raw, old)")(TextAnalysis.repetition(docsRaw))
    time("cleanCorpus(spread, old)")(TextAnalysis.cleanCorpus(docsSp))
    time("repetition(spread, old)")(TextAnalysis.repetition(docsSp))
    spark.stop()
  }
}
