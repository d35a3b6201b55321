package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Routing-signal measurement across every dedup fixture: prints each
  * corpus's BucketProfile with BOTH candidate signals (head doc fraction
  * vs head candidate share) and times plain vs prefix on the natural
  * corpus — the evidence behind the round-15 routing-rule change
  * (BASELINE.md round-15 table). `sbt "runMain graft.NatProbe"`.
  */
object NatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def share(l: String, p: Dedup.BucketProfile): Unit =
      println(f"$l: $p headFrac=${p.headFraction}%.4f headCandShare=${p.maxBucket * (p.maxBucket - 1) / 2.0 / math.max(1L, p.candPairs)}%.4f")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.sources.Tables.documents(spark, d)
      val zipf = graft.sources.ZipfCorpus.synth(docs.select("doc_id")).localCheckpoint()
      val zipfShk = Dedup.shingles(zipf).select(col("doc_id"), Dedup.shingleKey(col("shingle")).as("shk"))
      val zipfFp = graft.operators.TextAnalysis.winnowing(zipf).withColumnRenamed("fp", "shk")
      val docShk = Dedup.shingles(docs).select(col("doc_id"), Dedup.shingleKey(col("shingle")).as("shk"))
      val docFp = graft.operators.TextAnalysis.winnowing(docs).withColumnRenamed("fp", "shk")
      share(s"$d zipf shk", Dedup.bucketProfile(zipfShk))
      share(s"$d zipf fp", Dedup.bucketProfile(zipfFp))
      share(s"$d doc shk", Dedup.bucketProfile(docShk))
      share(s"$d doc fp", Dedup.bucketProfile(docFp))
    }
    val natShk = graft.queries.DedupQueries.persistedNaturalShingleKeys(spark)
    val natFp = graft.queries.TextAnalysisQueries.persistedNaturalWinnow(spark)
    share("natural shk", Dedup.bucketProfile(natShk))
    share("natural fp", Dedup.bucketProfile(natFp))
    // natural jaccard at 0.8: plain vs prefix wall-clock
    def time(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    val k = natShk.localCheckpoint()
    time("nat jac plain 1")(Dedup.ngramJaccardPairsFromKeys(k, 0.8).count())
    time("nat jac plain 2")(Dedup.ngramJaccardPairsFromKeys(k, 0.8).count())
    time("nat jac prefix 1")(Dedup.ngramJaccardPairsPrefixFromKeys(k, 0.8).count())
    time("nat jac prefix 2")(Dedup.ngramJaccardPairsPrefixFromKeys(k, 0.8).count())
    spark.stop()
  }
}
