package graft

import graft.functions.BloomAgg
import graft.operators.{Dedup, Sketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end checks for the Bloom novelty gate and the Misra–Gries
  * heavy-hitters pass (the buffer-level theorems live in BloomMgProps).
  */
class NoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloomNovelDocs: re-fetches and mirrors drop, novel docs survive") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma"),    // re-fetch: same id, same bytes
      (100L, "delta epsilon zeta"),// mirror: NEW id, existing bytes
      (101L, "kappa lambda mu"),   // genuinely novel
      (102L, "alpha beta gamma "), // trailing space → different bytes → novel
      (103L, "nu xi")              // novel
    ).toDF("doc_id", "text")
    val out = Dedup.bloomNovelDocs(batch, corpus).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((101L, 3L), (102L, 4L), (103L, 2L)))
  }

  test("bloomNovelDocs: tiny saturated filter still exact (FPs all verified away)") {
    import spark.implicits._
    // 64-bit filter with 200 corpus docs — nearly every probe is a false
    // positive, so ~the whole batch is forced down the exact-verify path;
    // output must STILL equal the plain anti-join.
    val corpus = spark.range(0, 200).select($"id".as("doc_id"),
      concat(lit("doc "), $"id".cast("string")).as("text"))
    val batch = spark.range(150, 260).select($"id".as("doc_id"),
      concat(lit("doc "), $"id".cast("string")).as("text"))
    val out = Dedup.bloomNovelDocs(batch, corpus, numBits = 64, numHashes = 2)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out.map(_._1) == (200L until 260L).toSeq)
  }

  test("bloom false-positive rate at design load is under the textbook bound") {
    val m = 1 << 17
    val k = 5
    val n = 5000
    val agg = new BloomAgg(m, k)
    val rnd = new scala.util.Random(42)
    val inserted = Array.fill(n)(rnd.nextLong())
    val bits = agg.finish(inserted.foldLeft(agg.zero)(agg.reduce))
    val probes = Array.fill(200000)(rnd.nextLong())
    val fp = probes.count(h => BloomAgg.mightContain(bits, k, h)).toDouble / probes.length
    // (1 - e^(-kn/m))^k ≈ 2.2e-4 at this load; allow 3x sampling slack
    val bound = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    assert(fp <= bound * 3, s"fp=$fp bound=$bound")
  }

  test("heavyHitters: equals the direct exact computation on the zipf corpus") {
    import spark.implicits._
    val corpus = queries.DedupQueries.persistedZipfCorpus(spark, TestSpark.sf0001)
    val got = Sketch.heavyHitters(corpus, 0.02, 128)
      .as[(String, Long)].collect().toSeq
    // ground truth: the full groupBy the sketch path exists to avoid
    val toks = corpus.select(explode(split(col("text"), "\\s+")).as("token"))
    val n = toks.count()
    val want = toks.groupBy("token").count()
      .filter(col("count") > n * 0.02)
      .orderBy("token")
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty) // the zipf stopwords must actually trip the gate
  }

  test("heavyHitters: guarantee precondition is enforced") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Sketch.heavyHitters(docs, 0.001, 128) // phi <= 1/(k+1): superset unproven
    }
  }

  test("bloomNovelDocs is mode-agnostic: streaming batch == batch batch at every prefix") {
    // the SAME plan builder, handed a streaming source, becomes a
    // stateless stream-static plan (bloom filter + md5 anti-join vs the
    // static corpus); its accumulated output must equal the batch run
    // over the rows fed so far, after every micro-batch
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"), (3L, "eta theta iota")
    ).toDF("doc_id", "text")
    val chunks = Seq(
      Seq((10L, "alpha beta gamma"), (11L, "new one here")),
      Seq((12L, "delta epsilon zeta"), (13L, "another new doc"), (14L, "eta theta iota")),
      Seq((15L, "third wave novel")))
    val mem = MemoryStream[(Long, String)]
    val out = Dedup.bloomNovelDocs(mem.toDF.toDF("doc_id", "text"), corpus)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r => (r.getLong(0), r.getLong(1))); ()
      }.start()
    try {
      var fed = Seq.empty[(Long, String)]
      for (chunk <- chunks) {
        mem.addData(chunk: _*)
        q.processAllAvailable()
        fed = fed ++ chunk
        val want = Dedup.bloomNovelDocs(fed.toDF("doc_id", "text"), corpus)
          .orderBy("doc_id").as[(Long, Long)].collect().toSeq
        assert(got.sortBy(_._1).toSeq == want,
          s"stream output diverged from batch after ${fed.size} rows")
      }
    } finally q.stop()
    assert(got.map(_._1).sorted == Seq(11L, 13L, 15L)) // novel docs only
  }

  test("seenStream: no duplicate ever passes; exact when the filter is roomy") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val chunks = Seq(
      Seq((1L, "a a a"), (2L, "b b"), (3L, "a a a")),          // 3 dups 1 in-batch
      Seq((4L, "b b"), (5L, "c"), (6L, "d")),                  // 4 dups 2 cross-batch
      Seq((7L, "a a a"), (8L, "e"), (9L, "c"), (10L, "f")))    // 7, 9 dups
    val mem = MemoryStream[(Long, String)]
    val flags = graft.streaming.SketchStreams.seenStream(
      mem.toDF.toDF("doc_id", "text"), numBits = 1 << 16, buckets = 4)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = flags.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
        graft.streaming.SketchStreams.SeenFlag], _: Long) =>
        got ++= b.collect().map(f => (f.doc_id, f.novel)); ()
      }.start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    // exact first-occurrence semantics at this load (FPs ~ 0 at 2^16/8 keys)
    val want = Seq(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> true,
      6L -> true, 7L -> false, 8L -> true, 9L -> false, 10L -> true)
    assert(got.sortBy(_._1).toSeq == want)
  }

  test("seenStream one-sided error: even saturated, a duplicate is never flagged novel") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    // 256-bit filter, 300 distinct texts: heavily saturated, so novel
    // docs WILL be false-positive-flagged dup — but the replayed
    // duplicates (same texts again, new ids) must ALL flag dup
    val mem = MemoryStream[(Long, String)]
    val flags = graft.streaming.SketchStreams.seenStream(
      mem.toDF.toDF("doc_id", "text"), numBits = 256, buckets = 4)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = flags.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
        graft.streaming.SketchStreams.SeenFlag], _: Long) =>
        got ++= b.collect().map(f => (f.doc_id, f.novel)); ()
      }.start()
    try {
      mem.addData((0L until 300L).map(i => (i, s"text number $i")): _*)
      q.processAllAvailable()
      mem.addData((0L until 300L).map(i => (1000L + i, s"text number $i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val replay = got.filter(_._1 >= 1000L)
    assert(replay.size == 300 && replay.forall(!_._2),
      "a seen text was flagged novel — bloom false negative, impossible")
  }

  test("dedup_bloom_novel registered query: exactly the 50 fresh ids") {
    val q = Registry.all.find(_.name == "dedup_bloom_novel").get
    val out = q.fn(spark, TestSpark.sf0001).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val mx = queries.DedupQueries.persistedZipfCorpus(spark, TestSpark.sf0001)
      .agg(max("doc_id")).head().getLong(0)
    assert(out == (mx + 1 to mx + 50).toSeq)
  }
}
