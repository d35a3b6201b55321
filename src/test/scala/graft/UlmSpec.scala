package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer specs: the Viterbi DP against a brute-force
  * enumeration of ALL segmentations (an in-suite independent
  * implementation, on top of the DuckDB oracle's unrolled-CTE one),
  * round-trip/coverage invariants, and trainer determinism.
  */
class UlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.operators.Ulm

  private lazy val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)

  test("viterbi DP equals brute-force min over ALL segmentations") {
    val wt = graft.operators.Bpe.wordTypes(docs).drop("sym").localCheckpoint()
    val vocab = Ulm.seed(wt, Ulm.Params().maxPieceLen, Ulm.Params().seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val cm = graft.operators.Ulm.costMap(vocab)
    val seg = Ulm.segment(wt, cm, Ulm.Params().maxPieceLen)
      .collect().map(r => r.getString(0) -> (r.getDouble(4), " " + r.getString(3))).toMap
    // brute force: all 2^(n-1) cut patterns, same (cost, path) order
    def brute(w: String): (Double, String) = {
      var best: (Double, String) = null
      val n = w.length
      for (mask <- 0 until (1 << (n - 1))) {
        var ok = true
        var cost = 0.0
        var path = ""
        var start = 0
        var i = 0
        while (i < n && ok) {
          val cut = i == n - 1 || ((mask >> i) & 1) == 1
          if (cut) {
            val piece = w.substring(start, i + 1)
            cm.get(piece) match {
              case Some(c) => cost += c; path = path + " " + piece; start = i + 1
              case None => ok = false
            }
          }
          i += 1
        }
        if (ok && (best == null || cost < best._1 ||
            (cost == best._1 && path.compareTo(best._2) < 0)))
          best = (cost, path)
      }
      best
    }
    assert(seg.nonEmpty)
    seg.foreach { case (w, got) =>
      assert(brute(w) == got, s"DP diverged from brute force on '$w'")
    }
  }

  test("segmentation round-trips; every piece is in the vocabulary; " +
    "cost is the left-fold of piece costs") {
    val (model, seg) = Ulm.train(docs)
    val vocab = model.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val vocabSet = vocab.map(_._1).toSet
    val rows = seg.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (word, pieces, n) = (r.getString(0), r.getString(3), r.getInt(2))
      val ps = pieces.split(" ")
      assert(ps.mkString("") == word, s"'$word' does not round-trip: '$pieces'")
      assert(ps.length == n)
      assert(ps.forall(vocabSet.contains), s"'$word' used an out-of-vocab piece")
    }
    // every single character of the corpus vocabulary is a piece
    val chars = rows.flatMap(_.getString(0).toCharArray).map(_.toString).toSet
    assert(chars.subsetOf(vocabSet))
    // final recounts: every piece count equals its path occurrences
    val used = rows.flatMap(r => r.getString(3).split(" ").map(_ -> r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    vocab.foreach { case (p, cnt, _) =>
      assert(cnt == used.getOrElse(p, 0L), s"count drift on '$p'")
    }
  }

  test("encode decodes back to the per-word segmentation stream") {
    val seg = Ulm.train(docs)._2.localCheckpoint()
    val segMap = seg.collect().map(r => r.getString(0) -> r.getString(3)).toMap
    // id → piece from the same binary piece order encode assigns
    val idOf = segMap.values.flatMap(_.split(" ")).toSeq.distinct.sorted
      .zipWithIndex.map { case (p, i) => (i + 1).toString -> p }.toMap
    val enc = Ulm.encode(docs, seg).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = graft.operators.Search.tokens(docs)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // NOTE: Search.tokens has no position — rebuild expectation from the
    // raw text to keep document order
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(toks.nonEmpty)
    enc.foreach { case (docId, ids) =>
      val decoded = ids.split(" ").map(idOf).mkString(" ")
      val expected = texts(docId).toLowerCase.split("\\s+")
        .filter(w => w.nonEmpty && !w.matches("^[0-9]+$"))
        .map(segMap).mkString(" ")
      assert(decoded == expected, s"doc $docId decode mismatch")
    }
  }

  test("hard-EM: each round's segmentation is Viterbi-optimal under its " +
    "input costs (the inequality behind ulm_em_curve)") {
    val P = Ulm.Params()
    val wt = graft.operators.Bpe.wordTypes(docs).drop("sym").localCheckpoint()
    val vocab = Ulm.seed(wt, P.maxPieceLen, P.seedSize).localCheckpoint()
    def cm(of: org.apache.spark.sql.DataFrame) =
      Ulm.costMap(of.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
    val c0 = cm(vocab)
    val seg1 = Ulm.segment(wt, c0, P.maxPieceLen).localCheckpoint()
    val c1 = cm(Ulm.pathCounts(seg1, vocab))
    val seg2 = Ulm.segment(wt, c1, P.maxPieceLen)
    // re-price round 1's paths under c1: round 2's total must not exceed it
    val seg1UnderC1 = seg1.collect()
      .map(r => r.getLong(1) * r.getString(3).split(" ").map(c1).sum).sum
    val seg2Total = seg2.collect()
      .map(r => r.getLong(1) * r.getDouble(4)).sum
    assert(seg2Total <= seg1UnderC1 + 1e-6,
      s"round-2 Viterbi total $seg2Total exceeds re-priced round-1 $seg1UnderC1")
    // and the registered card reproduces the same corpus totals
    val curve = Ulm.emCurve(docs, P).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(curve.keySet == Set(1, 2))
    val pieces1 = seg1.collect().map(r => r.getLong(1) * r.getInt(2)).sum
    assert(curve(1)._2 == pieces1)
  }

  test("trainer is run-to-run deterministic") {
    val a = Ulm.train(docs)._2.collect()
      .map(r => (r.getString(0), r.getString(3), r.getDouble(4))).sortBy(_._1).toSeq
    val b = Ulm.train(docs)._2.collect()
      .map(r => (r.getString(0), r.getString(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("the oracle-unroll assert is OPT-IN: the production path segments " +
    "a 20+-char word; an oracle-gated Params fails loudly on it") {
    import spark.implicits._
    val long = Seq((1L, "internationalization is a word and tiny ab abab", "src0"))
      .toDF("doc_id", "text", "source")
    // default Params: no length bound — the DP sizes per word
    val (model, seg) = Ulm.train(long)
    val vocabSet = model.collect().map(_.getString(0)).toSet
    val rows = seg.collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(rows.contains("internationalization"))
    rows.foreach { case (w, pieces) =>
      assert(pieces.split(" ").mkString("") == w)
      assert(pieces.split(" ").forall(vocabSet.contains))
    }
    // the SAME corpus under the oracle-gated Params aborts loudly
    val gated = Ulm.Params(assertMaxWordLen = Some(Ulm.MaxWordLen))
    val ex = intercept[org.apache.spark.SparkException] {
      Ulm.train(long, gated)._2.collect()
    }
    assert(ex.getMessage.contains("MaxWordLen") ||
      Option(ex.getCause).exists(_.getMessage.contains("MaxWordLen")))
  }

  test("leave-one-out Viterbi never undercuts the unconstrained one " +
    "(loss deltas are nonnegative) and skips the excluded piece") {
    import org.apache.spark.sql.functions._
    val P = Ulm.Params()
    val wt = graft.operators.Bpe.wordTypes(docs).drop("sym").localCheckpoint()
    val cm = Ulm.costMap(Ulm.seed(wt, P.maxPieceLen, P.seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
    val seg = Ulm.segment(wt, cm, P.maxPieceLen).localCheckpoint()
    val pairs = seg.select(col("word"), col("freq"), col("cost"),
      explode(array_distinct(filter(split(col("pieces"), " "),
        x => length(x) >= 2))).as("excl"))
    val alt = Ulm.segmentExcl(pairs, cm, P.maxPieceLen).collect()
    assert(alt.nonEmpty)
    alt.foreach { r =>
      assert(r.getDouble(4) >= r.getDouble(3),
        s"excluding '${r.getString(1)}' from '${r.getString(0)}' LOWERED the cost")
    }
    // re-price check on one pair: the alt path truly avoids the piece
    val cm2 = cm
    alt.take(200).foreach { r =>
      val w = r.getString(0); val x = r.getString(1)
      // brute force without x
      val b = bruteSeg(w, cm2 - x)
      assert(b != null && b._1 == r.getDouble(4), s"alt cost drift on ($w, $x)")
    }
  }

  test("pruning: schedule reaches the target, singles all survive, no " +
    "word is stranded, and the pruned segmentation is Viterbi-optimal") {
    val res = Ulm.pruneTrain(docs, Ulm.Params(),
      Ulm.PruneParams(targetMulti = 16, eta = 0.5))
    val vocab = res.card.collect().map(r => (r.getString(0), r.getLong(1)))
    val vocabSet = vocab.map(_._1).toSet
    assert(vocab.count(_._1.length >= 2) == 16)
    val rows = res.seg.collect()
    assert(rows.nonEmpty)
    // every word still segmentable, round-trips, uses only survivors
    rows.foreach { r =>
      val (w, pieces) = (r.getString(0), r.getString(3))
      assert(pieces.split(" ").mkString("") == w, s"'$w' stranded")
      assert(pieces.split(" ").forall(vocabSet.contains))
    }
    // all corpus characters survive as singles
    val chars = rows.flatMap(_.getString(0).toCharArray).map(_.toString).toSet
    assert(chars.subsetOf(vocabSet))
    // the final segmentation is the true Viterbi under its cost map
    rows.foreach { r =>
      val w = r.getString(0)
      val got = (r.getDouble(4), " " + r.getString(3))
      assert(bruteSeg(w, res.finalCosts) == got,
        s"pruned DP diverged from brute force on '$w'")
    }
    // curve structure: rounds 1..R+1, n_multi follows the schedule down
    // to target, singles count constant across rounds
    val curve = res.curve.orderBy("round").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(curve.map(_._1).toSeq == (1 to curve.length))
    assert(curve.last._2 == 16)
    assert(curve.map(_._2).toSeq == curve.map(_._2).toSeq.sorted.reverse)
    val singles = curve.map(c => c._3 - c._2).toSet
    assert(singles.size == 1, s"singles count drifted across rounds: $singles")
  }

  /** Brute force over all 2^(n-1) segmentations under `cm` — the
    * independent pricing shared by the DP and pruning pins. Returns
    * (cost, " "-prefixed path), null if unsegmentable.
    */
  private def bruteSeg(w: String, cm: Map[String, Double]): (Double, String) = {
    var best: (Double, String) = null
    val n = w.length
    require(n <= 30, s"brute force cap: $w")
    for (mask <- 0L until (1L << (n - 1))) {
      var ok = true
      var cost = 0.0
      var path = ""
      var start = 0
      var i = 0
      while (i < n && ok) {
        val cut = i == n - 1 || ((mask >> i) & 1L) == 1L
        if (cut) {
          val piece = w.substring(start, i + 1)
          cm.get(piece) match {
            case Some(c) => cost += c; path = path + " " + piece; start = i + 1
            case None => ok = false
          }
        }
        i += 1
      }
      if (ok && (best == null || cost < best._1 ||
          (cost == best._1 && path.compareTo(best._2) < 0)))
        best = (cost, path)
    }
    best
  }
}
