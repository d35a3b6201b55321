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

  test("corpus-scale fixture: J>=0.8 recovers EXACTLY the planted mirrors+light mutations; LSH matches; routing is plain") {
    import spark.implicits._
    val corpus = graft.sources.NaturalCorpus.corpus(spark)
    assert(corpus.count() == 2500)
    val keys = graft.operators.Dedup.shingles(corpus)
      .select(col("doc_id"), graft.operators.Dedup.shingleKey(col("shingle")).as("shk"))
      .localCheckpoint()
    // planted truth by formula
    val want = ((1L to 200L).map(i => (i, 1750L + i)) ++
      (1L to 150L).map(i => (400L + i, 2150L + i))).toSet
    val exact = graft.operators.Dedup.ngramJaccardPairsAutoFromKeys(keys, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact == want,
      s"extra=${(exact -- want).take(5)} missing=${(want -- exact).take(5)}")
    // banded LSH at the same bar loses nothing and adds nothing
    val lsh = graft.operators.Dedup.minhashLshPairsFrom(
        graft.operators.Dedup.shingles(corpus), 6, 2, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == want)
    // heavy mutations sit below the bar (they are in neither set)
    assert((1L to 100L).forall(i => !exact.contains((550L + i, 2300L + i))))
    // bucketProfile routing on natural recombined prose — the case that
    // CORRECTED the routing rule (round 15): head DOC fraction is 0.17
    // (the old signal would pick prefix) but the candidate mass lives in
    // the long tail of medium buckets (head candidate share 0.0034), and
    // plain measured 2-15x faster. The auto tier must pick PLAIN.
    val prof = graft.operators.Dedup.bucketProfile(keys)
    assert(!graft.operators.Dedup.usePrefixTier(prof),
      s"expected plain routing, got $prof")
    assert(prof.headFraction > 0.1, prof.toString)      // old signal: would mis-route
    assert(prof.headCandShare < 0.01, prof.toString)    // new signal: plain, with margin
  }

  test("corpus-scale fixture: directed containment catches every boilerplate wrap and quote embedding") {
    import spark.implicits._
    val corpus = graft.sources.NaturalCorpus.corpus(spark)
    val fp = graft.operators.TextAnalysis.winnowing(corpus)
      .withColumnRenamed("fp", "shk").localCheckpoint()
    val cont = graft.operators.Dedup.containmentPairsAutoFromKeys(fp, 0.3)
      .select("doc_contained", "doc_container").as[(Long, Long)].collect().toSet
    // every planted wrap/quote contains its base (direction: base IN wrap)
    (1L to 200L).foreach { i =>
      assert(cont.contains((200L + i, 1950L + i)), s"boilerplate $i")
    }
    (1L to 100L).foreach { i =>
      assert(cont.contains((650L + i, 2400L + i)), s"quote $i")
    }
    // the winnow fingerprint profile routes PLAIN too (head candidate
    // share 0.0085 despite a 0.16 head doc fraction) — prefix measured
    // 15x slower here (2.1 s vs 31.8 s, BASELINE.md round-15 table)
    val prof = graft.operators.Dedup.bucketProfile(fp)
    assert(!graft.operators.Dedup.usePrefixTier(prof), prof.toString)
  }

  test("fixture is the committed 40-doc corpus with the expected source mix") {
    val bySource = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(docs.count() == 40)
    assert(bySource == Map("siteA" -> 20L, "mirror" -> 4L, "aggregator" -> 4L,
      "blog" -> 2L, "siteB" -> 10L))
  }
}
