package graft

import org.scalatest.funsuite.AnyFunSuite

/** Soft-EM (forward-backward) verified against brute-force enumeration of
  * ALL segmentations: the lattice marginal α(n) equals the enumerated
  * Σ_seg Π p, and the edge-posterior soft counts equal the enumerated
  * expectations — on adversarial toy words with overlapping pieces. Plus
  * the corpus-level pins that make the honesty card meaningful: round-1
  * marginal NLL ≤ round-1 Viterbi NLL (same seed model), and both
  * trainers' curves decrease.
  */
class UlmSoftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.Ulm

  private val mpl = 6

  /** All segmentations of `w` into pieces of `pm`. */
  private def segs(w: String, pm: Map[String, Double]): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(mpl, w.length)).flatMap { l =>
      val h = w.substring(0, l)
      if (pm.contains(h)) segs(w.substring(l), pm).map(h +: _) else Seq.empty
    }

  private def close(a: Double, b: Double, tol: Double): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  // overlapping pieces force genuinely multi-path lattices
  private val pm = Map("a" -> 0.3, "b" -> 0.2, "ab" -> 0.1, "ba" -> 0.05,
    "bb" -> 0.04, "abba" -> 0.01)
  private val words = Seq("ab", "ba", "abba", "babab", "aabbaa", "bbbb")

  test("lattice marginal α(n) equals brute-force Σ over ALL segmentations") {
    val wt = words.map(w => (w, 1L)).toDF("word", "freq")
    val got = Ulm.marginals(wt, pm, mpl).as[(String, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    words.foreach { w =>
      val want = segs(w, pm).map(_.map(pm).product).sum
      assert(close(got(w), want, 1e-12), s"'$w': ${got(w)} vs $want")
    }
  }

  test("soft counts equal brute-force posterior expectations") {
    val freq = 3L
    val wt = words.map(w => (w, freq)).toDF("word", "freq")
    val got = Ulm.softEdges(wt, pm, mpl)
      .groupBy("piece").agg(org.apache.spark.sql.functions.sum("c").as("e"))
      .as[(String, Double)].collect().toMap
    val want = collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    words.foreach { w =>
      val ss = segs(w, pm)
      val pw = ss.map(_.map(pm).product).sum
      ss.foreach { s =>
        val post = s.map(pm).product / pw
        s.foreach(p => want(p) += freq * post)
      }
    }
    want.foreach { case (p, e) =>
      // stab(6) per edge: tolerance a few grid steps per contributing edge
      assert(close(got.getOrElse(p, 0.0), e, 1e-4), s"'$p': ${got.get(p)} vs $e")
    }
    // total expected pieces == Σ freq·E[n_pieces]: conservation check
    val totWant = words.map { w =>
      val ss = segs(w, pm)
      val pw = ss.map(_.map(pm).product).sum
      freq * ss.map(s => s.map(pm).product * s.size).sum / pw
    }.sum
    assert(close(got.values.sum, totWant, 1e-4))
  }

  test("round 1: soft marginal NLL ≤ hard Viterbi NLL (same seed model); both curves decrease") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val P = graft.queries.UlmQueries.P
    val soft = Ulm.softTrain(docs, P)._2.as[(Int, Double)].collect().toMap
    val hard = Ulm.emCurve(docs, P).as[(Int, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(soft(1) <= hard(1),
      s"all-segmentations mass must be ≥ best-path mass: ${soft(1)} vs ${hard(1)}")
    assert(soft(2) < soft(1), "soft-EM objective must improve")
    assert(hard(2) < hard(1), "hard-EM objective must improve")
  }

  test("soft-entry pruning: schedule invariants hold and the entry pricing " +
    "genuinely differs from hard entry") {
    val d = TestSpark.sf0001
    val P = graft.queries.UlmQueries.P
    val PP = graft.queries.UlmQueries.PP
    val docs = graft.sources.Tables.documents(spark, d)
    val wt = graft.operators.Bpe.wordTypes(docs).drop("sym").localCheckpoint()
    val seedMultis = Ulm.seed(wt, P.maxPieceLen, P.seedSize)
      .filter(org.apache.spark.sql.functions.length($"piece") >= 2)
      .select("piece").as[String].collect().toSet
    val seedSingles = Ulm.seed(wt, P.maxPieceLen, P.seedSize)
      .filter(org.apache.spark.sql.functions.length($"piece") === 1)
      .select("piece").as[String].collect().toSet

    val softModel = Ulm.softTrain(docs, P)._1
    val res = Ulm.pruneFromSoft(wt, softModel, P, PP,
      expectMulti0 = Some(P.seedSize))

    // schedule invariants on the soft path: n_multi walks the static
    // schedule, n_vocab = n_multi + singles, final vocab hits the target
    val curve = res.curve.as[(Int, Int, Int, Double, Long)].collect().sortBy(_._1)
    val multiBefore = Ulm.pruneSchedule(P.seedSize, PP).scanLeft(P.seedSize)(_ - _)
    assert(curve.map(_._2).toSeq == multiBefore)
    curve.foreach { case (_, nm, nv, _, _) =>
      assert(nv == nm + seedSingles.size, "n_vocab = n_multi + singles")
    }
    val card = res.card.as[(String, Long, Double)].collect()
    val cardMultis = card.map(_._1).filter(_.length >= 2).toSet
    assert(cardMultis.size == PP.targetMulti)
    assert(cardMultis.subsetOf(seedMultis), "survivors come from the seed")
    assert(seedSingles.subsetOf(card.map(_._1).toSet), "single-char pieces never drop")

    // the composition is not a no-op: the soft entry cost table differs
    // from the hard one (measured at this fixture — the vs-card's round
    // NLLs diverge), even though both paths may converge downstream
    val cnt0 = Ulm.pathCounts(
      Ulm.train(docs, P)._2, Ulm.seed(wt, P.maxPieceLen, P.seedSize))
    val hardCurve = Ulm.pruneFrom(wt, cnt0, P, PP, Some(P.seedSize))
      .curve.as[(Int, Int, Int, Double, Long)].collect().sortBy(_._1)
    assert(curve.map(_._4).toSeq != hardCurve.map(_._4).toSeq,
      "soft and hard entry pricing must produce different round objectives")
  }

  test("the stab(12) grid cliff fails LOUDLY at the source, not as silent " +
    "oracle drift") {
    val e = intercept[IllegalArgumentException] {
      Ulm.probMap0(Seq(("a", 2_000_000_000_000L)))
    }
    assert(e.getMessage.contains("grid overflow"))
    val e2 = intercept[IllegalArgumentException] {
      Ulm.probMapSoft(Seq(("a", 2.0e12)))
    }
    assert(e2.getMessage.contains("grid overflow"))
    // well inside the domain: no throw
    assert(Ulm.probMap0(Seq(("a", 3L), ("b", 1L))).size == 2)
  }

  test("prune classification is codepoint-based: an astral single-codepoint " +
    "piece is a SINGLE — never anchored as multi, never in the drop pool") {
    val gothic = new String(Character.toChars(0x10348)) // 1 codepoint, 2 UTF-16 units
    val docs = Seq(
      (0L, s"ab $gothic ${gothic}ab ab ba"),
      (1L, s"ab${gothic} ab $gothic ba${gothic}"),
      (2L, s"$gothic ab ${gothic}ab ba")).toDF("doc_id", "text")
    val P2 = Ulm.Params(maxPieceLen = 3, seedSize = 4, iters = 1)
    // the foreign-text tier: Bpe.wordTypes' reference-parity ASCII
    // normalize would strip the astral word before the trainer saw it
    val wt = graft.operators.ByteFallback.wordTypes(docs)
      .drop("sym").localCheckpoint()
    val seedDf = Ulm.seed(wt, P2.maxPieceLen, P2.seedSize).localCheckpoint()
    val pieces = seedDf.select("piece").as[String].collect().toSeq
    assert(pieces.contains(gothic), "the astral char seeds as a single")
    val nMulti = pieces.count(Ulm.cpLen(_) >= 2)
    assert(pieces.exists(p => Ulm.cpLen(p) >= 2 && p.codePoints().count() < p.length),
      "the seed holds at least one astral-bearing MULTI piece too")
    val cm0 = Ulm.costMap(
      seedDf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
    val cnt0 = Ulm.pathCounts(
      Ulm.segment(wt, cm0, P2.maxPieceLen, None), seedDf)
    // pre-fix this require fired (String.length called the astral single a
    // multi) or, unanchored, the astral single drew delta 0.0 and dropped
    val res = Ulm.pruneFrom(wt, cnt0, P2,
      Ulm.PruneParams(targetMulti = 1, eta = 0.5), Some(nMulti))
    val card = res.card.select("piece").as[String].collect().toSeq
    assert(card.contains(gothic), "the astral single survives pruning")
    assert(card.count(Ulm.cpLen(_) >= 2) == 1, "target multi count reached")
    pieces.filter(Ulm.cpLen(_) == 1).foreach(p =>
      assert(card.contains(p), s"single '$p' never drops"))
  }
}
