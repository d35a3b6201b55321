package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def vecs = {
    import spark.implicits._
    // orthogonal + parallel fixtures, labels partition {0,1}
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f), 1),
      (10L, Array(2.0f, 0.0f, 0.0f), 0),   // cos=1 with vec 0
      (11L, Array(1.0f, 1.0f, 0.0f), 0),   // cos=1/√2 with vec 0
      (12L, Array(0.0f, 3.0f, 0.0f), 1)    // cos=1 with vec 1
    ).toDF("vec_id", "embedding", "label")
  }

  test("cosinePairs finds parallel vectors") {
    import spark.implicits._
    val p = Similarity.cosinePairs(vecs, 0.99)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(p.map(x => (x._1, x._2)) == Seq((0L, 10L), (1L, 12L)))
    assert(p.forall(_._3 == 1.0))
  }

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    import spark.implicits._
    val r = Similarity.bruteForceTopK(vecs, 2, 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(x => (x._1, x._3))
    // query 0: best = 10 (cos 1), then 11 (cos .707)
    assert(r.filter(_._1 == 0L).map(x => (x._2, x._3)) == Seq((10L, 1L), (11L, 2L)))
    // query 1: best = 12 (cos 1), then 11 (cos .707)
    assert(r.filter(_._1 == 1L).map(x => (x._2, x._3)) == Seq((12L, 1L), (11L, 2L)))
  }

  test("ivfTopK routes each query to its own cell") {
    import spark.implicits._
    val r = Similarity.ivfTopK(vecs, 2, 3)
      .select("query_id", "probe_label", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq
    // query 0 probes label 0 (centroid along x), finds 10 and 11 only
    assert(r.filter(_._1 == 0L).map(_._2).forall(_ == 0))
    assert(r.filter(_._1 == 0L).map(_._3).toSet == Set(10L, 11L))
    // query 1 probes label 1, finds 12
    assert(r.filter(_._1 == 1L).map(_._2).forall(_ == 1))
    assert(r.filter(_._1 == 1L).map(_._3).toSet == Set(12L))
  }
}
