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

  test("dedup_bloom_novel registered query: exactly the 50 fresh ids") {
    val q = Registry.all.find(_.name == "dedup_bloom_novel").get
    val out = q.fn(spark, TestSpark.sf0001).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val mx = queries.DedupQueries.persistedZipfCorpus(spark, TestSpark.sf0001)
      .agg(max("doc_id")).head().getLong(0)
    assert(out == (mx + 1 to mx + 50).toSeq)
  }
}
