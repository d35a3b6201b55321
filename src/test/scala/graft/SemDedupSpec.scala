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

  test("keep: one keeper per group, keeper is the least-typical member") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf0001)
    val rows = SemDedup.keep(emb, 0.45)
      .select("vec_id", "component", "ccos", "keep")
      .as[(Long, Long, Double, Boolean)].collect()
    // only vectors that appear in some near-dup pair are listed
    val paired = SemDedup.pairs(emb, 0.45)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(rows.map(_._1).toSet == paired)
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (_, members) =>
      assert(members.count(_._4) == 1) // exactly one keeper
      val keeper = members.find(_._4).get
      // the paper's diversity rule: keeper minimizes centroid cosine,
      // ties to the lower vec_id
      val best = members.minBy(m => (m._3, m._1))
      assert(keeper._1 == best._1)
      // component id is the min member id (label-propagation fixpoint)
      assert(members.map(_._1).min == members.head._2)
    }
  }

  test("clusterSample: per-cell budget respected, members drawn from the cell, deterministic") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf0001)
    val perCell = 7
    val got = SemDedup.clusterSample(emb, perCell)
      .select("cell", "rn", "vec_id").as[(Int, Long, Long)].collect()
    val cells = SemDedup.cells(emb).select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    // every sampled row really lives in its claimed cell
    got.foreach { case (cell, _, id) => assert(cells(id) == cell) }
    // budget: min(perCell, |cell|) rows per cell, ranks 1..n
    val sizes = cells.groupBy(_._2).map { case (c, m) => c -> m.size }
    got.groupBy(_._1).foreach { case (cell, rows) =>
      assert(rows.length == math.min(perCell, sizes(cell)))
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: a second draw is identical
    val again = SemDedup.clusterSample(emb, perCell)
      .select("cell", "rn", "vec_id").as[(Int, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("salted within-cell join: identical pair set at salt 1/4/16, including an all-one-cell corpus") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf0001)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cell", "cos")
        .as[(Long, Long, Int, Double)].collect().sorted.toSeq
    val want = canon(SemDedup.pairs(emb, 0.3))
    assert(want.nonEmpty)
    Seq(1, 4, 16).foreach { s =>
      assert(canon(SemDedup.pairsSalted(emb, 0.3, salt = s)) == want,
        s"salt=$s")
    }
    // degenerate: every vector lands in ONE cell (identical embeddings
    // up to scale — cosine 1.0 everywhere) — the skew the salt exists
    // for; the pair set must still be the exact triangle
    val deg = (0L until 60L)
      .map(i => (i, Array(1.0f + (i % 3) * 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val degPairs = canon(SemDedup.pairsSalted(deg, 0.9, salt = 16))
    assert(degPairs.size == 60 * 59 / 2)
    assert(degPairs == canon(SemDedup.pairs(deg, 0.9)))
  }

  test("probe-routed salt: balanced corpora route PLAIN, the degenerate " +
    "one-cell collapse routes SALTED, and the auto output is tier-invariant") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf0001)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cell", "cos")
        .as[(Long, Long, Int, Double)].collect().sorted.toSeq
    // the gate corpus: balanced clustering → head share ≈ 1/k, well
    // under the 0.4 rule → plain tier (so dedup_semantic_auto shares the
    // plain oracle by DECISION, not just by output equality)
    val asg = SemDedup.cells(emb, 8, 3).localCheckpoint()
    val balanced = SemDedup.cellProfile(asg)
    assert(balanced.nVecs > 0 && balanced.headCandShare < 0.4 / 2,
      s"balanced profile ${balanced.headCandShare} not ≥2× under the rule")
    assert(!SemDedup.useSaltedTier(balanced))
    // degenerate: one cell owns everything → share ≈ 1, ≥ 2× over
    val deg = (0L until 60L)
      .map(i => (i, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val degProf = SemDedup.cellProfile(SemDedup.cells(deg, 8, 3))
    assert(degProf.headCandShare > 0.4 * 2,
      s"degenerate profile ${degProf.headCandShare} not ≥2× over the rule")
    assert(SemDedup.useSaltedTier(degProf))
    // and the AUTO form equals the plain form on both profiles
    assert(canon(SemDedup.pairsAuto(emb, 0.3)) == canon(SemDedup.pairs(emb, 0.3)))
    assert(canon(SemDedup.pairsAuto(deg, 0.9)) == canon(SemDedup.pairs(deg, 0.9)))
    // empty assignment routes plain (zero-candidate profile, no NPE)
    val empty = SemDedup.cellProfile(
      Seq.empty[(Long, Int)].toDF("vec_id", "cell"))
    assert(!SemDedup.useSaltedTier(empty) && empty.headCandShare == 0.0)
  }

  test("clusterSample: two-phase bucket rank is invariant in nBuckets and survives an all-one-cell corpus") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf0001)
    def draw(nb: Int) = SemDedup.clusterSample(emb, 7, nBuckets = nb)
      .select("cell", "rn", "vec_id").as[(Int, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // the SourceCap containment playbook: phase-1 bucketing at any width
    // keeps a superset of the per-cell top-k, so the final sample is
    // bucket-count-invariant (nBuckets=1 IS the single-window form)
    val one = draw(1)
    assert(draw(4) == one && draw(16) == one)
    // degenerate skew: every vector in ONE cell (all-identical
    // embeddings → k-means collapses) — the shape phase 1 exists for;
    // output must still be the deterministic hash-order top-k
    val deg = (0L until 200L)
      .map(i => (i, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = SemDedup.clusterSample(deg, 5, nBuckets = 16)
      .select("cell", "rn", "vec_id").as[(Int, Long, Long)].collect()
    assert(got.length == 5)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = (0L until 200L).sortBy(i => (md5hex(i.toString), i)).take(5)
    assert(got.sortBy(_._2).map(_._3).toSeq == want)
  }
}
