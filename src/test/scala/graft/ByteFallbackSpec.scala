package graft

import org.scalatest.funsuite.AnyFunSuite

/** Byte-fallback encode contract, both families, against the sf0.001
  * corpus with planted foreign tokens: ZERO dropped words (the encode is
  * total), full decode ROUND-TRIP through the extended vocabulary
  * (regular pieces + byte pieces reassemble every doc's kept words
  * byte-exactly, CJK and accented Latin included), no behavior change on
  * a clean all-ASCII corpus, and the streaming batch twins inherit the
  * exact same output.
  */
class ByteFallbackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.{Bpe, ByteFallback, Ulm}

  private val d = TestSpark.sf0001

  private lazy val base = graft.sources.Tables.documents(spark, d)
    .select("doc_id", "text")
  private lazy val docsF = ByteFallback.planted(base)
  private lazy val merges = graft.queries.BpeQueries.trainedMerges(spark, d)
  private lazy val symIds = Bpe.symbolIds(Bpe.wordTypes(base), merges)
    .localCheckpoint()
  private lazy val seg = graft.queries.UlmQueries.persistedUlmSeg(spark, d)
  private lazy val ulmCosts = graft.queries.UlmQueries.vocabFrom(spark, d)
    .select("piece", "nll").collect()
    .map(r => (r.getString(0), r.getDouble(1))).toMap
  private lazy val pids = Ulm.pieceIds(seg).localCheckpoint()
  private val maxPieceLen = graft.queries.UlmQueries.P.maxPieceLen

  /** Kept words of the foreign corpus per doc, in order, concatenated. */
  private lazy val wantText: Map[Long, String] = {
    import org.apache.spark.sql.functions._
    ByteFallback.tokens(docsF)
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("word")))),
        x => x("word")), "").as("t"))
      .as[(Long, String)].collect().toMap
  }

  private def decode(ids: Seq[Long], regular: Map[Long, String], b0: Long): String = {
    val sb = new StringBuilder
    val bytes = collection.mutable.ArrayBuffer.empty[Byte]
    def flush(): Unit =
      if (bytes.nonEmpty) { sb ++= new String(bytes.toArray, "UTF-8"); bytes.clear() }
    ids.foreach { id =>
      if (id > b0) bytes += (id - b0 - 1).toByte
      else { flush(); sb ++= regular(id) }
    }
    flush()
    sb.toString
  }

  test("fixture plants foreign words; the unicode tokenize keeps them") {
    val foreign = wantText.values.count(_.exists(_ > 127))
    assert(foreign > 50, s"only $foreign docs carry a foreign token")
    // the ASCII normalize would have split them: sanity-check divergence
    val ascii = graft.operators.Search.tokens(docsF)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val uni = ByteFallback.tokens(docsF)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(uni.exists { case (id, n) => ascii(id) != n })
  }

  test("BPE bytes encode: total (zero dropped words) and byte-exact decode round-trip") {
    val wids = Bpe.wordIdsFromFixedBytes(
      ByteFallback.wordTypes(docsF), merges, symIds)
    val nTypes = ByteFallback.wordTypes(docsF).select("word").distinct().count()
    assert(wids.count() == nTypes, "a word type dropped out of the encode")

    val symOf = symIds.as[(String, Int)].collect()
      .map { case (s, i) => (i.toLong, s) }.toMap
    val b0 = symOf.keys.max
    val enc = ByteFallback.encodeFrom(docsF, wids, "n_sym", "n_bpe_tokens")
      .as[(Long, String, Long)].collect()
    assert(enc.length == wantText.size, "a doc dropped out of the encode")
    enc.foreach { case (id, ids, _) =>
      val got = decode(ids.split(" ").map(_.toLong).toSeq, symOf, b0)
      assert(got == wantText(id), s"doc $id decode mismatch")
    }
  }

  test("ULM bytes encode: total and byte-exact decode round-trip") {
    val wids = Ulm.wordIdsFromFixedBytes(
      ByteFallback.wordTypes(docsF).drop("sym"), ulmCosts, maxPieceLen, pids)
    val nTypes = ByteFallback.wordTypes(docsF).select("word").distinct().count()
    assert(wids.count() == nTypes, "a word type dropped out of the encode")

    val pieceOf = pids.as[(String, Int)].collect()
      .map { case (p, i) => (i.toLong, p) }.toMap
    val b0 = pieceOf.keys.max
    val enc = ByteFallback.encodeFrom(docsF, wids, "n_pieces", "n_ulm_tokens")
      .as[(Long, String, Long)].collect()
    assert(enc.length == wantText.size)
    enc.foreach { case (id, ids, _) =>
      val got = decode(ids.split(" ").map(_.toLong).toSeq, pieceOf, b0)
      assert(got == wantText(id), s"doc $id decode mismatch")
    }
  }

  test("non-BMP plants: a 4-byte codepoint rides the fallback as ONE char " +
    "and round-trips byte-exactly") {
    // the planted tokens include astral letters (CJK Ext B, Gothic)
    val astral = ByteFallback.Tokens.filter(t => t.codePointCount(0, t.length) < t.length)
    assert(astral.nonEmpty, "fixture lost its non-BMP plants")
    val types = ByteFallback.wordTypes(docsF).select("word").as[String].collect()
    val astralTypes = types.filter(w => w.codePointCount(0, w.length) < w.length)
    assert(astralTypes.nonEmpty, "no astral word type reached the model")

    // 'x<gothic>y': the DP walks CODEPOINTS, so the surrogate pair is
    // ONE fallback char expanding to its 4 UTF-8 bytes — 6 ids total
    // (x and y ride the 1-byte fallback too when the trained
    // segmentation never used them as standalone pieces). A UTF-16-unit
    // DP would have priced TWO phantom chars and emitted a different
    // piece count (and the SQL twin, which counts codepoints, would
    // hash-diverge).
    val gothic = "x𐍈y" // x U+10348 y
    assert(astralTypes.contains(gothic))
    val wids = Ulm.wordIdsFromFixedBytes(
      ByteFallback.wordTypes(docsF).drop("sym"), ulmCosts, maxPieceLen, pids)
      .as[(String, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val (ids, np) = wids(gothic)
    val pieceOf = pids.as[(String, Int)].collect()
      .map { case (p, i) => (i.toLong, p) }.toMap
    val b0 = pieceOf.keys.max
    val idSeq = ids.split(" ").map(_.toLong).toSeq
    assert(np == 6L, s"1+4+1 bytes expected, got $np for ids $idSeq")
    assert(idSeq.count(_ > b0) >= 4, "the astral char must expand to 4 byte pieces")
    assert(decode(idSeq, pieceOf, b0) == gothic)
  }

  test("clean ASCII corpus: bytes tier is behavior-identical to the strict tier") {
    val strict = Bpe.wordIdsFromFixed(Bpe.wordTypes(base), merges, symIds)
      .as[(String, String, Long)].collect().sortBy(_._1).toSeq
    val bytes = Bpe.wordIdsFromFixedBytes(Bpe.wordTypes(base), merges, symIds)
      .as[(String, String, Long)].collect().sortBy(_._1).toSeq
    assert(bytes == strict, "fallback changed an in-vocabulary encode")
    val uStrict = Ulm.wordIdsFromFixed(
      Bpe.wordTypes(base).drop("sym"), ulmCosts, maxPieceLen, pids)
      .as[(String, String, Long)].collect().sortBy(_._1).toSeq
    val uBytes = Ulm.wordIdsFromFixedBytes(
      Bpe.wordTypes(base).drop("sym"), ulmCosts, maxPieceLen, pids)
      .as[(String, String, Long)].collect().sortBy(_._1).toSeq
    assert(uBytes == uStrict, "fallback changed an in-vocabulary segmentation")
  }

  test("streaming batch twins inherit the bytes encode exactly") {
    val bWids = Bpe.wordIds(Bpe.wordTypes(base), merges).localCheckpoint()
    val sGot = graft.streaming.TokenStreams
      .bpeEncodeBatchBytes(docsF, merges, bWids, symIds)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val sWant = SparkEntry.queries("bpe_encode_bytes")(spark, d).as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(sGot == sWant, "streaming BPE bytes twin diverged from the gated query")

    val uWids = Ulm.wordIds(seg).localCheckpoint()
    val uGot = graft.streaming.TokenStreams
      .ulmEncodeBatchBytes(docsF, ulmCosts, maxPieceLen, uWids, pids)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val uWant = SparkEntry.queries("ulm_encode_bytes")(spark, d).as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(uGot == uWant, "streaming ULM bytes twin diverged from the gated query")
  }
}
