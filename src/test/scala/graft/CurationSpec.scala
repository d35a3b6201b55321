package graft

import graft.operators.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composite curation decision must equal the set algebra of its
  * component signals computed independently — the composition (joins,
  * anti-joins, split filter) is what this spec pins; each signal's own
  * values are pinned by the per-signal specs and oracles.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sf0001

  test("cleanGate (row-local) keeps exactly cleanCorpus's (aggregate) doc set") {
    import spark.implicits._
    for (dd <- Seq(TestSpark.sf0001, TestSpark.sf001)) {
      val docs = graft.sources.Tables.documents(spark, dd)
      val agg = TextAnalysis.cleanCorpus(docs).select("doc_id").as[Long].collect().toSet
      val rowLocal = docs.filter(TextAnalysis.cleanGate())
        .select("doc_id").as[Long].collect().toSet
      assert(rowLocal == agg, dd)
      assert(rowLocal.nonEmpty, dd)
    }
  }

  test("curate == clean ∩ low-rep ∩ low-nll − contaminated − dup-drop, train split only") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, d)
    val sh = Dedup.shingles(docs, 3)
    val lm = TextAnalysis.bigramLm(docs)
    val pairs = Dedup.ngramJaccardPairsFromKeys(
      sh.select(col("doc_id"), Dedup.shingleKey(col("shingle")).as("shk")), 0.6)

    val got = Curation.curate(docs, sh, lm, pairs)
      .select("doc_id").as[Long].collect().toSet

    val clean = TextAnalysis.cleanCorpus(docs).select("doc_id").as[Long].collect().toSet
    val repOk = TextAnalysis.repetition(docs)
      .filter(col("rep_ratio") <= 0.05).select("doc_id").as[Long].collect().toSet
    val nllOk = TextAnalysis.bigramNllFrom(TextAnalysis.bigramStream(docs), lm)
      .filter(col("avg_nll") <= 3.45).select("doc_id").as[Long].collect().toSet
    val bench = sh.filter(col("doc_id") < 10).select("shingle").distinct()
    val contam = sh.filter(col("doc_id") >= 10).join(bench, "shingle")
      .groupBy("doc_id").count().filter(col("count") > 4)
      .select("doc_id").as[Long].collect().toSet
    val dupDrop = Dedup.clusters(pairs)
      .filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id").as[Long].collect().toSet

    val want = (clean intersect repOk intersect nllOk)
      .filter(_ >= 10) diff contam diff dupDrop
    assert(got == want)
    assert(got.nonEmpty)
    assert(got.forall(_ >= 10)) // the eval split never leaks into training
  }
}
