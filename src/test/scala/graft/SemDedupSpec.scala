package graft

import graft.operators.{SemDedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cells: total assignment, non-degenerate balance, deterministic") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf0001)
    val n = emb.count()
    val cells = SemDedup.cells(emb).as[(Long, Int)].collect()
    assert(cells.length == n) // every vector assigned exactly once
    val sizes = cells.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.keys.forall(c => c >= 0 && c < 8))
    // real clustering, not collapse: no cell holds over half the corpus
    assert(sizes.values.max <= n / 2)
    assert(cells.sorted.toSeq == SemDedup.cells(emb).as[(Long, Int)].collect().sorted.toSeq)
  }

  test("pairs are the within-cluster subset of the exact all-pairs answer") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf0001)
    val sem = SemDedup.pairs(emb, 0.45)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    val exact = Similarity.cosinePairs(emb, 0.45)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    // same cosine arithmetic, restricted to co-clustered pairs — so a
    // strict subset relation must hold, with identical cos values
    assert(sem.subsetOf(exact))
    val cellOf = SemDedup.cells(emb).as[(Long, Int)].collect().toMap
    val coClustered = exact.filter { case (a, b, _) => cellOf(a) == cellOf(b) }
    assert(sem == coClustered) // and it is EXACTLY the co-clustered subset
  }
}
