package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s", 1L),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "s", 1L), // exact dup of 1
      (3L, "alpha beta gamma delta epsilon eta", "en", "s", 1L),  // near dup of 1
      (4L, "one two three four five six", "en", "s", 1L)          // unrelated
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("shingles: distinct 3-grams in order windows") {
    import spark.implicits._
    val sh = Dedup.shingles(docs.filter($"doc_id" === 1L), 3)
      .orderBy("shingle").as[(Long, String)].collect().map(_._2).toSeq
    assert(sh == Seq(
      "alpha beta gamma", "beta gamma delta", "delta epsilon zeta",
      "gamma delta epsilon"))
  }

  test("exact dedup groups identical texts") {
    import spark.implicits._
    val g = Dedup.exact(docs).orderBy("keep_id")
      .as[(Long, Long)].collect().toSeq
    assert(g == Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("ngram jaccard finds exact and near dups, not unrelated") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.3)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Double)].collect().toSeq
    // docs 1,2 identical → jaccard 1.0; 1-3 and 2-3 share 3 of 5 shingles → 0.6
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs.head._3 == 1.0)
    assert(math.abs(pairs(1)._3 - 0.6) < 1e-12)
  }

  test("clusters: chain merges into one component, min id wins") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L))
      .toDF("doc_a", "doc_b")
    val c = graft.operators.Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("minhash LSH surfaces the exact-dup pair") {
    import spark.implicits._
    val pairs = Dedup.minhashLshPairs(docs, 3, 3, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    // identical docs always share all bands
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    // unrelated doc 4 never appears
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs get identical hashes; 16-bit range") {
    import spark.implicits._
    val h = Dedup.simhash(docs).orderBy("doc_id")
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    assert(h.values.forall(v => v >= 0 && v < 65536))
  }
}
