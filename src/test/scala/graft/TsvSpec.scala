package graft

import graft.operators.Search
import graft.sources.{Tables, Tsv}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

class TsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("reference-format TSV sinks round-trip (sorted single-file mode)") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val vocab = Search.vocabulary(docs)
    val dir = java.nio.file.Files.createTempDirectory("tsv").toString

    Tsv.writeVocabulary(vocab, s"$dir/vocab", sorted = true)
    Tsv.writePostings(Search.postings(docs, vocab), s"$dir/post", sorted = true)
    Tsv.writeDocInfo(Search.docInfo(docs), s"$dir/docinfo", sorted = true)

    def lines(sub: String): Seq[String] = {
      val part = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.startsWith("part-")).toSeq
      assert(part.size == 1) // sorted mode = reference's single-reducer layout
      java.nio.file.Files.readAllLines(part.head.toPath).asScala.toSeq
    }

    val v = lines("vocab")
    assert(v.size == vocab.count())
    // `word \t "wordId df"`, sorted by word = id order (quirk Q-a)
    val first = v.head.split("\t")
    assert(first.length == 2 && first(1).split(" ").length == 2)
    assert(v.map(_.split("\t")(0)) == v.map(_.split("\t")(0)).sorted)
    assert(v.head.split("\t")(1).split(" ")(0) == "0")

    val p = lines("post").head.split("\t")
    assert(p.length == 3 && p.forall(_.forall(_.isDigit)))

    val d = lines("docinfo").head.split("\t")
    assert(d.length == 2)

    // readers round-trip the written contracts exactly
    val vBack = Tsv.readVocabulary(spark, s"$dir/vocab")
      .orderBy("word").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val vOrig = vocab.orderBy("word")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(vBack.toSeq == vOrig.toSeq)
    val pBack = Tsv.readPostings(spark, s"$dir/post").count()
    assert(pBack == Search.postings(docs, vocab).count())
  }
}
