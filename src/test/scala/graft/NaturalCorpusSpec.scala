package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Linguistic validation of the dedup thresholds on the committed
  * natural-English fixture (round 13 — SURVEY §2.9: previously every
  * threshold measurement rode the synthetic zipf corpus). The planted
  * structure (graft.sources.NaturalCorpus / tools/make_natural_fixture
  * .py) makes each behavior assertable, not just plausible: exact
  * mirrors, a light-mutation copy JUST above the 0.8 Jaccard bar,
  * boilerplate-wrapped and full-quote variants that symmetric Jaccard
  * must SKIP but directed containment must catch, a heavy-mutation copy
  * below both bars' pair level, and stopword-only unrelated docs that
  * nothing may pair.
  */
class NaturalCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = graft.sources.NaturalCorpus.docs(spark)

  private def shk = graft.operators.Dedup.shingles(docs)
    .select(col("doc_id"), graft.operators.Dedup.shingleKey(col("shingle")).as("shk"))

  val Mirrors = Set((1L, 21L), (2L, 22L), (3L, 23L), (4L, 24L))
  val LightMut = (9L, 29L)
  val HeavyMut = (10L, 30L)
  val Wrapped = Set((5L, 25L), (6L, 26L), (7L, 27L), (8L, 28L))
  val Quote = (11L, 31L)

  test("J=0.8 bar on natural text: mirrors + light mutation pass; boilerplate, quote, heavy mutation, unrelated do not") {
    val pairs = graft.operators.Dedup.ngramJaccardPairsFromKeys(shk, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet == Mirrors + LightMut)
    Mirrors.foreach(p => assert(pairs(p) == 1.0, s"mirror $p"))
    assert(pairs(LightMut) > 0.8 && pairs(LightMut) < 0.9,
      "light mutation should sit just above the bar")
  }

  test("banded LSH on natural text surfaces exactly the true >=0.8 pairs") {
    import graft.queries.DedupQueries.{KeepBands, KeepRows}
    val lsh = graft.operators.Dedup.minhashLshPairsFrom(
        graft.operators.Dedup.shingles(docs), KeepBands, KeepRows, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == Mirrors + LightMut)
  }

  test("directed containment catches what Jaccard must miss: wrapped bodies and the embedded quote") {
    val c = graft.operators.Dedup.containmentPairsFromKeys(
        graft.operators.TextAnalysis.winnowing(docs)
          .withColumnRenamed("fp", "shk"), 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every base is FULLY contained in its boilerplate wrap / quoting doc
    (Wrapped + Quote).foreach { case (base, variant) =>
      assert(c((base, variant)) == 1.0, s"base $base in variant $variant")
    }
    // heavy mutation: invisible to the 0.8 Jaccard pair bar, still
    // surfaced by containment at partial strength
    assert(c(HeavyMut) > 0.3 && c(HeavyMut) < 0.8)
    // the false-positive bar: unrelated shorts (32..40) pair with nothing
    val inPairs = c.keySet.flatMap(p => Set(p._1, p._2))
    assert(inPairs.forall(_ <= 31L), s"unrelated doc paired: $inPairs")
  }

  test("fixture is the committed 40-doc corpus with the expected source mix") {
    val bySource = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(docs.count() == 40)
    assert(bySource == Map("siteA" -> 20L, "mirror" -> 4L, "aggregator" -> 4L,
      "blog" -> 2L, "siteB" -> 10L))
  }
}
