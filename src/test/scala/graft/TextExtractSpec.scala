package graft

import org.scalatest.funsuite.AnyFunSuite

/** TextExtract verified against an INDEPENDENT third implementation: a
  * plain-Scala char-walk extractor (no regex, no Spark) over the same
  * wrapped pages — every doc at sf0.001 must extract identically. Plus
  * decision-level pins for each planted hazard: boilerplate and promo
  * link farms never leak, inline anchors keep their text, entities
  * unescape, malformed (unclosed-tag) pages still yield their content,
  * and the empty-content population extracts to '' (never null).
  */
class TextExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.TextExtract

  private val BlockTags =
    Set("p", "nav", "header", "footer", "h1", "title", "script", "style")

  // ---- the reference extractor: a hand-rolled char walk ------------------

  private def tagRunAt(s: String, lt: Int): String = {
    var e = lt + 1
    while (e < s.length && s(e).isLetterOrDigit) e += 1
    s.substring(lt + 1, e)
  }

  private def refBlocks(html: String): Seq[String] = {
    val starts = collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < html.length) {
      if (html(i) == '<' && BlockTags(tagRunAt(html, i))) starts += i
      i += 1
    }
    val bounds = (0 +: starts.toSeq) :+ html.length
    bounds.sliding(2).collect {
      case Seq(a, b) if a < b => html.substring(a, b)
    }.toSeq
  }

  private def refVisible(b: String): String = {
    val sb = new StringBuilder
    var inTag = false
    b.foreach {
      case '<' => inTag = true
      case '>' => inTag = false
      case c => if (!inTag) sb += c
    }
    val un = graft.operators.TextExtract.Entities.foldLeft(sb.toString) {
      case (x, (e, v)) => x.replace(e, v)
    }
    un.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
  }

  /** Chars captured by '<a[^>]*>([^<]*)</a>' — matched by hand. */
  private def refLinkChars(b: String): Int = {
    var i = 0
    var n = 0
    while (i < b.length) {
      val open = b.indexOf("<a", i)
      if (open < 0) i = b.length
      else {
        val gt = b.indexOf('>', open)
        if (gt < 0) i = b.length
        else {
          var e = gt + 1
          while (e < b.length && b(e) != '<') e += 1
          if (b.startsWith("</a>", e)) { n += e - (gt + 1); i = e + 4 }
          else i = open + 1
        }
      }
    }
    n
  }

  private def refKeep(b: String): Boolean = {
    val tag = if (b.startsWith("<")) tagRunAt(b, 0) else ""
    val vis = refVisible(b)
    tag == "p" && vis.length >= TextExtract.MinChars &&
      TextExtract.Den * refLinkChars(b) <= vis.length
  }

  private def refExtract(html: String): String =
    refBlocks(html).filter(refKeep).map(refVisible).mkString("\n")

  // ---- fixtures -----------------------------------------------------------

  private lazy val docs =
    graft.sources.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
  private lazy val pages = TextExtract.wrapped(docs)
  private lazy val htmlById =
    pages.as[(Long, String)].collect().toMap
  private lazy val extractedById =
    TextExtract.extract(pages).as[(Long, String)].collect().toMap

  private def hexSlice(id: Long, pos: Int, len: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ext:$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(pos - 1, pos - 1 + len), 16)
  }

  test("every sf0.001 doc: Spark extraction == independent char-walk extraction") {
    assert(htmlById.size == 500)
    htmlById.foreach { case (id, html) =>
      assert(extractedById(id) == refExtract(html), s"doc $id")
    }
  }

  test("boilerplate never leaks: nav/footer/promo/script/style text absent from every extraction") {
    extractedById.values.foreach { t =>
      assert(!t.contains("go 0") && !t.contains("copyright") &&
        !t.contains("buy now") && !t.contains("page "))
      // code and CSS payloads drop whole
      assert(!t.contains("track(") && !t.contains("var t") &&
        !t.contains("color: red"))
    }
    // ...and no markup survives tag stripping
    extractedById.values.foreach(t => assert(!t.contains("<a ") && !t.contains("</")))
    // the script/style populations are actually planted
    assert(htmlById.values.count(_.contains("<script>")) > 20)
    assert(htmlById.values.count(_.contains("<style>")) > 20)
  }

  test("round trip: a clean two-para doc reassembles to the original text") {
    val texts = docs.as[(Long, String)].collect().toMap
    val clean = htmlById.keys.filter { id =>
      hexSlice(id, 13, 2) % 10 != 7 && hexSlice(id, 13, 2) % 10 != 3 &&
        hexSlice(id, 17, 2) % 10 != 8 &&
        hexSlice(id, 9, 2) % 10 >= 3 // no inline anchor (its density can drop a short para1)
    }
    assert(clean.nonEmpty)
    clean.foreach { id =>
      assert(extractedById(id).replace("\n", " ") == texts(id), s"doc $id")
    }
  }

  test("planted hazards all present and handled") {
    val entity = htmlById.keys.filter(id => hexSlice(id, 13, 2) % 10 == 7 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(entity.nonEmpty)
    entity.foreach(id => assert(extractedById(id).endsWith("x < y & z"), s"doc $id"))

    val entityNum = htmlById.keys.filter(id => hexSlice(id, 13, 2) % 10 == 3 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(entityNum.nonEmpty)
    entityNum.foreach(id =>
      assert(extractedById(id).endsWith("q < r & s \"t'"), s"doc $id"))

    val empty = htmlById.keys.filter(id => hexSlice(id, 17, 2) % 10 == 8)
    assert(empty.nonEmpty)
    empty.foreach(id => assert(extractedById(id) == "", s"doc $id"))

    val malformed = htmlById.keys.filter(id => hexSlice(id, 15, 2) % 10 == 9)
    assert(malformed.nonEmpty)
    malformed.foreach { id =>
      assert(htmlById(id).contains("<nav><a") && !htmlById(id).contains("</nav>"))
      if (hexSlice(id, 17, 2) % 10 != 8)
        assert(extractedById(id).nonEmpty, s"doc $id") // unclosed tags never kill content
    }

    val inline = htmlById.keys.filter(id => hexSlice(id, 9, 2) % 10 < 3 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(inline.nonEmpty)
    inline.foreach(id => assert(htmlById(id).contains("""<a href="/w">"""), s"doc $id"))
  }

  test("keep rule: density edge cases decided exactly at the 1/3 boundary") {
    val mk = Seq(
      (1L, "<p>abcdef</p>"), // no links, kept
      (2L, """<p><a href="/x">ab</a>cdef</p>"""), // 2 link of 6 visible: 6<=6 kept
      (3L, """<p><a href="/x">abc</a>def</p>"""), // 3 of 6: 9>6 dropped
      (4L, "<p>a</p>"), // too short
      (5L, "<nav>plenty of visible text here</nav>"), // wrong tag
      (6L, """<p><a href="/x">abc</a> unclosed <a href="/y">zz</p>""")) // 2nd anchor never closes -> only abc counts: 9 > len? visible="abc unclosed zz"=15, 9<=15 kept
      .toDF("doc_id", "html")
    val got = TextExtract.blocks(mk).as[(Long, Long, String, Long, Long, Boolean)]
      .collect().filter(_._3 == "p").map(r => r._1 -> r._6).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false, 6L -> true))
    // and the char-walk agrees on every one of them
    mk.as[(Long, String)].collect().foreach { case (id, h) =>
      val blk = refBlocks(h).head
      if (id != 5L) assert(refKeep(blk) == got(id), s"case $id")
    }
  }
}
