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

  test("contrastivePairs: labels, gray-zone drop, hardest-k negative cap, tie determinism") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 10L, 0.90), // pos
      (1L, 11L, 0.85), // pos (positives are never capped)
      (1L, 12L, 0.60), // gray zone — dropped
      (1L, 20L, 0.50), (1L, 21L, 0.40), (1L, 22L, 0.30),
      (1L, 23L, 0.20), (1L, 24L, 0.10), (1L, 25L, 0.05), // 6 negs → top 5 kept
      (1L, 26L, 0.04), // below floor — dropped
      (2L, 30L, 0.30), (2L, 31L, 0.30)) // tie → doc_b ascending decides rank
      .toDF("doc_a", "doc_b", "jaccard")
    val r = Selection.contrastivePairs(pairs)
      .as[(Long, Long, Double, String)].collect()
    val byA = r.groupBy(_._1)
    assert(byA(1L).count(_._4 == "pos") == 2)
    val negs1 = byA(1L).filter(_._4 == "neg").map(_._2).sorted
    assert(negs1.toSeq == Seq(20L, 21L, 22L, 23L, 24L), s"negs=$negs1")
    assert(!r.exists(t => t._2 == 12L || t._2 == 26L))
    // a tie inside the cap keeps both, deterministically
    assert(byA(2L).map(_._2).sorted.toSeq == Seq(30L, 31L))
    assert(r.forall(t => t._4 == "pos" || (t._3 >= 0.05 && t._3 <= 0.5)))
  }
}
