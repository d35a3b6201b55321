package graft

import graft.operators.QualityRules
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decision-level coverage for the published rule filters: each Gopher
  * gate flips on a hand-built doc, modal ties break deterministically,
  * OOV counts against a known vocabulary, and the group split never
  * straddles a source. (The registered queries hash-gate the full
  * outputs against DuckDB; these cases pin the RULES at the boundaries
  * the fixture corpus doesn't reach.)
  */
class QualityRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("gopher quality: each gate flips independently") {
    val pass = (Seq("the", "and") ++ (1 to 48).map(i => s"word$i")).mkString(" ")
    val short = "the and word word"                       // n_words < 50
    val longWords = (Seq("the", "and") ++                 // mean_wlen > 10
      (1 to 48).map(i => s"extraordinarily$i")).mkString(" ")
    val noStop = (1 to 50).map(i => s"word$i").mkString(" ") // n_stop < 2
    val d = QualityRules.gopherQuality(docs(
      1L -> pass, 2L -> short, 3L -> longWords, 4L -> noStop))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(d == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("gopher quality: alphabetic-fraction gate and signal values") {
    // 50 words, 15 of them pure punctuation runs (kept by the token rule,
    // no [a-z]) → alpha_frac = 0.7 < 0.8
    val symbolic = (Seq("the", "and") ++ (1 to 33).map(i => s"w$i") ++
      (1 to 15).map(_ => "!!!")).mkString(" ")
    val r = QualityRules.gopherQuality(docs(1L -> symbolic))
      .select("n_words", "alpha_frac", "keep")
      .as[(Long, Double, Boolean)].head()
    assert(r._1 == 50L && r._2 == 35.0 / 50.0 && !r._3)
  }

  test("gopher repetition: modal shares, deterministic tie-break, gate") {
    // "b b b a c": top word b (3/5); bigrams: [b b, b b, b a, a c] → top
    // "b b" (2/4) > 0.2 → reject
    val rep = QualityRules.gopherRepetition(docs(1L -> "b b b a c"))
      .as[(Long, Long, String, Double, String, Double, Boolean)].head()
    assert(rep == ((1L, 5L, "b", 0.6, "b b", 0.5, false)))
    // tie on count → lexicographically smallest gram wins, both levels:
    // words a,b both ×2; bigrams b a / a z / z a / a b all ×1
    val tie = QualityRules.gopherRepetition(docs(2L -> "b a z a b"))
      .select("top_word", "top_bigram").as[(String, String)].head()
    assert(tie == (("a", "a b")))
  }

  test("oov rate: counts against the top-k vocabulary, ties on word") {
    // corpus counts: x→4, y→3, z→2, q→1; k=2 vocab = {x, y}
    val d = Seq(("s1", "x x x y y"), ("s2", "x y z z q"))
      .toDF("source", "text").withColumn("doc_id", monotonically_increasing_id())
    val r = QualityRules.oovRate(d, k = 2)
      .select("source", "n_tokens", "n_oov", "oov_frac")
      .as[(String, Long, Long, Double)].collect()
      .map { case (s, b, c, f) => s -> ((b, c, f)) }.toMap
    assert(r("s1") == ((5L, 0L, 0.0)))
    assert(r("s2") == ((5L, 3L, 0.6)))
  }

  test("word entropy: zero for one repeated word, ln(n) for all-distinct") {
    val d = docs(
      1L -> "w w w w w",                 // one word → H = 0
      2L -> "a b c d",                   // all distinct → H = ln(4)
      3L -> "a a b b")                   // uniform 2×2 → H = ln(2)
    val r = QualityRules.wordEntropy(d)
      .select("doc_id", "n_words", "entropy")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    def stab(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r(1L) == ((5L, 0.0)))
    assert(r(2L)._1 == 4L && math.abs(r(2L)._2 - stab(math.log(4.0))) < 2e-6)
    assert(r(3L)._1 == 4L && math.abs(r(3L)._2 - stab(math.log(2.0))) < 2e-6)
  }

  test("source terms: distinctive words score ln(S/df), ubiquitous words score 0") {
    // 'shared' is in both sources → ln(2/2) = 0; each source's own word
    // scores tf·ln(2/1) and tops its source
    val d = Seq(("s1", "alpha alpha shared"), ("s2", "beta shared shared"))
      .toDF("source", "text").withColumn("doc_id", monotonically_increasing_id())
    val r = QualityRules.sourceTerms(d, k = 2)
      .select("source", "rk", "word", "score")
      .as[(String, Long, String, Double)].collect().toSeq.sorted
    def stab(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r == Seq(
      ("s1", 1L, "alpha", stab(2 * math.log(2.0))), ("s1", 2L, "shared", 0.0),
      ("s2", 1L, "beta", stab(math.log(2.0))), ("s2", 2L, "shared", 0.0)))
  }

  test("split by source: group-consistent, both splits populated") {
    val d = (0L until 200L).map(i => (i, s"src${i % 20}", "t"))
      .toDF("doc_id", "source", "text")
    val s = QualityRules.splitBySource(d)
    // every source maps to exactly one split
    assert(s.groupBy("source").agg(countDistinct("split").as("n"))
      .filter(col("n") =!= 1).count() == 0)
    val bySplit = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "val"))
    // and the split is stable across invocations (pure hash, no RNG)
    assert(QualityRules.splitBySource(d).exceptAll(s).count() == 0)
  }

  test("sourceKlDrift: zero for identical slices, positive for a skewed one, Gibbs bound") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "en", "same1", 0),
      (2L, "alpha beta gamma alpha beta", "en", "same2", 0),
      (3L, "zeta zeta zeta zeta zeta", "en", "skewed", 0)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kl = QualityRules.sourceKlDrift(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // a slice with the blend's own distribution still has kl > 0 when
    // OTHER slices pull the corpus away; but two identical slices share
    // the same value, and every kl obeys Gibbs (≥ 0 up to stab noise)
    assert(kl("same1") == kl("same2"))
    assert(kl.values.forall(_ >= -1e-5), s"Gibbs violated: $kl")
    assert(kl("skewed") > kl("same1"),
      "the disjoint-vocabulary slice must diverge more than the majority slices")
    // single-source corpus: the slice IS the corpus → exactly 0
    val one = QualityRules.sourceKlDrift(
      docs.filter($"source" === "same1")).collect()
    assert(one.length == 1 && math.abs(one(0).getDouble(2)) < 1e-9)
  }

  test("psiDrift: identical snapshots score 0, a planted shift scores positive, totals consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0 until 100).map(i =>
      (i.toLong, "t", "en", "s", 40 + (i % 5) * 60)).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val same = graft.operators.Curation.psiDrift(docs, docs).collect()
    assert(same.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
    // shift: the new snapshot loses all long docs
    val shifted = graft.operators.Curation.psiDrift(
      docs, docs.filter($"n_chars" < 200)).collect()
    val total = shifted.head.getDouble(4)
    assert(shifted.forall(r => r.getDouble(4) == total), "total must be constant")
    assert(total > 0.25, s"a planted mass shift must cross PSI's alert bar, got $total")
    // per-bucket terms of a PSI are individually non-negative:
    // (pn − po) and ln(pn/po) always share a sign
    assert(shifted.forall(_.getDouble(3) >= 0.0))
  }

  test("docKeywords: the planted distinctive term ranks first for its doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common words here plus xylophone xylophone", "en", "s", 0),
      (2L, "common words here plus another thing", "en", "s", 0),
      (3L, "common words here plus more filler", "en", "s", 0)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val top = QualityRules.docKeywords(docs, 1).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top(1L) == "xylophone", s"got $top")
  }
}
