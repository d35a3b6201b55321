package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Two disjoint vocabularies: target docs speak "alpha", raw-only docs
    * speak "zeta". DSIR must rank a held-out alpha-speaking doc above every
    * zeta-speaking doc — the defining property of the importance weight.
    */
  test("weights: target-domain docs outrank off-domain docs") {
    import spark.implicits._
    val alpha = "alpha beta gamma delta epsilon alpha beta gamma delta epsilon"
    val zeta = "zeta eta theta iota kappa zeta eta theta iota kappa"
    val docs = (
      (0L until 5L).map(i => (i, alpha, "t")) ++ // the target corpus
        Seq((5L, alpha, "r")) ++ // held-out doc WRITTEN IN the target domain
        (6L until 11L).map(i => (i, zeta, "r")) // off-domain raw docs
      ).toDF("doc_id", "text", "source")
    val w = Selection.weights(docs, col("source") === "t")
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    assert(w.size == 11) // total: every doc with >= 1 gram is scored
    val heldOut = w(5L)
    (6L until 11L).foreach(i => assert(heldOut > w(i),
      s"held-out in-domain doc must outrank off-domain doc $i"))
    // and in-domain docs score positive, off-domain negative (the smoothed
    // raw model still mostly explains alpha-grams; it never explains the
    // target model's view of zeta-grams)
    assert(heldOut > 0.0 && w(6L) < 0.0)
  }

  test("weights on the fixture corpus: total, deterministic, integer-exact") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val isT = col("source") === "src0"
    val a = Selection.weights(docs, isT).orderBy("doc_id").collect()
    assert(a.length == docs.count())
    // re-planned run is value-identical — the gate's whole premise
    val b = Selection.weights(docs, isT).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    // logw is an exact multiple of 1e-6: pure integer pipeline behind it
    a.foreach { r =>
      val micro = r.getDouble(2) * 1e6
      assert(math.abs(micro - math.rint(micro)) < 1e-6)
    }
  }

  test("selectTopK: ranked prefix of the weight ordering, deterministic ties") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val isT = col("source") === "src0"
    val k = 10
    val top = Selection.selectTopK(docs, isT, k)
      .select("rank", "doc_id").as[(Long, Long)].collect()
    val full = Selection.weights(docs, isT)
      .select("doc_id", "logw").as[(Long, Double)].collect()
      .sortBy { case (id, lw) => (-lw, id) }.take(k).map(_._1)
    assert(top.map(_._1).toSeq == (1L to k).toSeq)
    assert(top.sortBy(_._1).map(_._2).toSeq == full.toSeq)
  }
}
