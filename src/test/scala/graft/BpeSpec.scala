package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("mergeExpr: whole-symbol match only, greedy left-to-right") {
    import spark.implicits._
    def m(sym: String, pair: String): String =
      Seq(sym).toDF("sym")
        .select(Bpe.mergeExpr(col("sym"), pair)).as[String].head()
    assert(m(" a  b ", "a b") == " ab ")
    // own-delimiter rendering: pair "a b" must NOT fire inside ("ba","b")
    assert(m(" ba  b ", "a b") == " ba  b ")
    // greedy left-to-right on overlap: (a,a) over "aaa" → ["aa","a"]
    assert(m(" a  a  a ", "a a") == " aa  a ")
    // consecutive non-overlapping matches both fire
    assert(m(" a  b  a  b ", "a b") == " ab  ab ")
  }

  test("train + encode match hand-computed BPE on a tiny corpus") {
    import spark.implicits._
    // words: aaa×1, ab×3 → round 1 picks "a b" (3 > 2), round 2 "a a"
    val docs = Seq((1L, "aaa ab"), (2L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, 2)
    assert(merges.map(m => (m.step, m.pair, m.cnt)) ==
      Seq((1, "a b", 3L), (2, "a a", 2L)))
    val vocab = Bpe.symbolVocab(Bpe.wordTypes(docs), merges)
      .as[(String, Long)].collect().toMap
    assert(vocab == Map("ab" -> 3L, "aa" -> 1L, "a" -> 1L))
    val perDoc = Bpe.docTokenCounts(docs, merges).as[(Long, Long)].collect().toMap
    assert(perDoc == Map(1L -> 3L, 2L -> 2L)) // aaa→[aa,a]=2 +ab→1; ab,ab→2
  }

  test("train on the fixture: full run, counts non-increasing, budgets consistent") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val merges = Bpe.train(docs, 8)
    assert(merges.map(_.step) == (1 to 8))
    assert(merges.forall(_.pair.split(" ").length == 2))
    // a newly created pair occurs at most as often as the symbol just
    // merged, so selected counts never increase across rounds
    assert(merges.map(_.cnt).sliding(2).forall(w => w(0) >= w(1)))
    // total corpus symbols: vocabulary view and per-doc view must agree
    val vocabTotal = Bpe.symbolVocab(Bpe.wordTypes(docs), merges)
      .agg(sum("n_tokens")).as[Long].head()
    val docTotal = Bpe.docTokenCounts(docs, merges)
      .agg(sum("bpe_tokens")).as[Long].head()
    assert(vocabTotal == docTotal && vocabTotal > 0)
    // merging strictly shrinks the budget vs character-level
    val charTotal = Bpe.wordTypes(docs)
      .agg(sum(length(col("word")) * col("freq"))).as[Long].head()
    assert(docTotal < charTotal)
  }

  test("trainBatched: batch=1 reproduces classic train; batched run fills and conserves") {
    import spark.implicits._
    val tiny = Seq((1L, "aaa ab"), (2L, "ab ab")).toDF("doc_id", "text")
    // batch=1: every round picks the global argmax — the classic trainer
    assert(Bpe.trainBatched(tiny, 2, 1) == Bpe.train(tiny, 2))
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    assert(Bpe.trainBatched(docs, 8, 1) == Bpe.train(docs, 8))
    // batch=8: requested merges delivered, steps dense, counts
    // non-increasing WITHIN each selection (global argmax first), and
    // the batched tokenizer still conserves the corpus budget
    val ms = Bpe.trainBatched(docs, 16, 8)
    assert(ms.map(_.step) == (1 to 16))
    val vocabTotal = Bpe.symbolVocab(Bpe.wordTypes(docs), ms)
      .agg(sum("n_tokens")).as[Long].head()
    val docTotal = Bpe.docTokenCounts(docs, ms)
      .agg(sum("bpe_tokens")).as[Long].head()
    assert(vocabTotal == docTotal && vocabTotal > 0)
    val charTotal = Bpe.wordTypes(docs)
      .agg(sum(length(col("word")) * col("freq"))).as[Long].head()
    assert(docTotal <= charTotal - 16) // every merge fired at least once
  }

  test("chunked encode: 256-merge train+encode with bounded plan depth") {
    import spark.implicits._
    // deterministic synthetic corpus rich enough to sustain 256 merge
    // rounds (400 random 6-letter words ≈ 2000 pair instances)
    val rnd = new scala.util.Random(7)
    val words = (0 until 400).map(_ =>
      (1 to 6).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = words.grouped(8).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, 256)
    assert(merges.size == 256)
    assert(merges.map(_.step) == (1 to 256))
    val encoded = Bpe.applyMerges(Bpe.wordTypes(docs), merges)
    // bounded depth: the chunked encode cuts lineage every ChunkMerges
    // merges, so the FINAL plan segment carries at most ChunkMerges
    // replaces — not all 256
    val plan = encoded.queryExecution.optimizedPlan.toString.toLowerCase
    val nReplace = "replace\\(".r.findAllIn(plan).size
    assert(nReplace > 0 && nReplace <= Bpe.ChunkMerges,
      s"final plan segment carries $nReplace replaces")
    // the encode is still a real tokenization: total symbol instances
    // conserved downward vs character level, never zero
    val total = encoded
      .select(sum(size(split(trim(col("sym")), "  ")) * col("freq")).as("t"))
      .as[Long].head()
    val charTotal = Bpe.wordTypes(docs)
      .agg(sum(length(col("word")) * col("freq"))).as[Long].head()
    assert(total > 0 && total <= charTotal - 256) // each merge fired ≥ once
  }

  test("persisted ledger: trainedMerges round-trips the inline trainer; deep tier is dense and round-trips encode") {
    import spark.implicits._
    val d = TestSpark.sf0001
    val docs = graft.sources.Tables.documents(spark, d)
    // the setup artifact serves EXACTLY what the inline trainer produces
    assert(graft.queries.BpeQueries.trainedMerges(spark, d) ==
      Bpe.trainBatched(docs, graft.queries.BpeQueries.NumMerges, batch = 1))
    // deep tier: dense steps, budget respected, first pick = global argmax
    val deep = graft.queries.BpeQueries.trainedMergesDeep(spark, d)
    assert(deep.map(_.step) == (1 to graft.queries.BpeQueries.DeepMerges))
    assert(deep.head == Bpe.train(docs, 1).head)
    // encode under the deep ledger (crosses ChunkMerges → multi-chunk
    // applyMerges) still round-trips: id streams decode to the exact
    // tokenized text
    val idToSym = Bpe.symbolIds(Bpe.wordTypes(docs), deep)
      .as[(String, Int)].collect().map(_.swap).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    Bpe.encode(docs, deep).as[(Long, String, Long)].collect().foreach {
      case (id, ids, n) =>
        val seq = ids.split(" ").map(_.toInt)
        assert(seq.length.toLong == n)
        val want = texts(id).toLowerCase.split("\\s+")
          .filter(w => w.nonEmpty && !w.matches("^[0-9]+$")).mkString
        assert(seq.map(idToSym).mkString == want, s"doc $id")
    }
  }

  test("encode round-trips: ids decode through the inverse vocab back to the exact text") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val merges = Bpe.trainBatched(docs, 8, batch = 1)
    val wt = Bpe.wordTypes(docs)
    val idToSym = Bpe.symbolIds(wt, merges)
      .as[(String, Int)].collect().map(_.swap).toMap
    val enc = Bpe.encode(docs, merges)
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val counts = Bpe.docTokenCounts(docs, merges).as[(Long, Long)].collect().toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(enc.keySet == counts.keySet)
    enc.foreach { case (id, (ids, n)) =>
      val seq = ids.split(" ").map(_.toInt)
      // the id stream's length is the doc's token budget
      assert(seq.length.toLong == n && n == counts(id))
      // decoding: concatenated symbols reproduce the tokenized text
      // (symbols never span word boundaries, so word joins are lossless
      // up to the whitespace the tokenizer normalized away)
      val decoded = seq.map(idToSym).mkString
      val want = texts(id).toLowerCase.split("\\s+")
        .filter(w => w.nonEmpty && !w.matches("^[0-9]+$")).mkString
      assert(decoded == want, s"doc $id")
    }
  }
}
