package graft

import org.scalatest.funsuite.AnyFunSuite

/** TextExtract verified against an INDEPENDENT third implementation: a
  * plain-Scala char-walk extractor (no regex, no Spark) over the same
  * wrapped pages — every doc at sf0.001 must extract identically. Plus
  * decision-level pins for each planted hazard: boilerplate and promo
  * link farms never leak, inline anchors keep their text, entities
  * unescape (named + arbitrary numeric incl. non-BMP; unknown named pass
  * through), malformed (unclosed-tag) pages still yield their content,
  * the empty-content population extracts to '' (never null), MIXED-CASE
  * tags segment identically to lowercase, div/li/td content blocks are
  * kept under the same density rule, and comments (with `>` inside) and
  * CDATA sections drop whole before the block walk.
  */
class TextExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.TextExtract

  private val BlockTags: Set[String] = TextExtract.BlockTags.split('|').toSet
  private val ContentTags: Set[String] = TextExtract.ContentTags.toSet
  private val NamedMap: Map[String, String] = TextExtract.Named.toMap

  // ---- the reference extractor: a hand-rolled char walk ------------------

  private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def isWordChar(c: Char): Boolean = isAsciiAlnum(c) || c == '_'

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Strip <!-- comments --> and <![CDATA[ sections ]]> — PreRe's twin. */
  private def refPreClean(html: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < html.length) {
      if (html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4)
        i = if (e < 0) { sb.append(html.substring(i)); html.length } else e + 3
      } else if (html.startsWith("<![CDATA[", i)) {
        val e = html.indexOf("]]>", i + 9)
        i = if (e < 0) { sb.append(html.substring(i)); html.length } else e + 3
      } else { sb += html(i); i += 1 }
    }
    sb.toString
  }

  /** Lowercased maximal ASCII-alnum tag run after '<' at position lt. */
  private def tagRunAt(s: String, lt: Int): String = {
    var e = lt + 1
    while (e < s.length && isAsciiAlnum(s(e))) e += 1
    s.substring(lt + 1, e).toLowerCase
  }

  /** A '<tag' opens a block iff tag is block-level AND the char after the
    * run is not a word char (the regex's trailing \b — '_' is a word char
    * for \b but not part of the [a-z0-9]+ run).
    */
  private def opensBlock(s: String, lt: Int): Boolean = {
    var e = lt + 1
    while (e < s.length && isAsciiAlnum(s(e))) e += 1
    e > lt + 1 && BlockTags(s.substring(lt + 1, e).toLowerCase) &&
      !(e < s.length && s(e) == '_')
  }

  private def refBlocks(raw: String): Seq[String] = {
    val html = refPreClean(raw)
    val starts = collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < html.length) {
      if (html(i) == '<' && opensBlock(html, i)) starts += i
      i += 1
    }
    val bounds = (0 +: starts.toSeq) :+ html.length
    bounds.sliding(2).collect {
      case Seq(a, b) if a < b => html.substring(a, b)
    }.toSeq
  }

  private def cpStr(cp: Long): String =
    if (cp >= 1 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
      new String(Character.toChars(cp.toInt))
    else "�"

  /** Single-pass entity decode — EntityRe's hand-walk twin. Decoded
    * output is never re-scanned (no double-unescape).
    */
  private def refUnescape(s0: String): String = {
    val s = s0.filterNot(c => c == '\u0002' || c == '\u0003')
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      var consumed = false
      if (s(i) == '&') {
        val sem = s.indexOf(';', i + 1)
        if (sem > i + 1) {
          val tok = s.substring(i + 1, sem)
          val dec: Option[String] =
            if (tok.matches("#[xX][0-9a-fA-F]{1,6}"))
              Some(cpStr(java.lang.Long.parseLong(tok.drop(2), 16)))
            else if (tok.matches("#[0-9]{1,7}")) Some(cpStr(tok.drop(1).toLong))
            else if (tok.matches("[a-zA-Z]{2,8}"))
              Some(NamedMap.getOrElse(tok, "&" + tok + ";"))
            else None
          dec.foreach { d => sb.append(d); i = sem + 1; consumed = true }
        }
      }
      if (!consumed) { sb += s(i); i += 1 }
    }
    sb.toString
  }

  private def refVisible(b: String): String = {
    val sb = new StringBuilder
    var inTag = false
    b.foreach {
      case '<' => inTag = true
      case '>' => inTag = false
      case c => if (!inTag) sb += c
    }
    val un = refUnescape(sb.toString)
    un.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
  }

  /** Codepoints captured by '(?i)<a\b[^>]*>([^<]*)</a>' — matched by hand. */
  private def refLinkChars(b: String): Int = {
    var i = 0
    var n = 0
    while (i < b.length) {
      if (b(i) == '<' && i + 1 < b.length &&
        (b(i + 1) == 'a' || b(i + 1) == 'A') &&
        !(i + 2 < b.length && isWordChar(b(i + 2)))) {
        val gt = b.indexOf('>', i + 2)
        if (gt < 0) i = b.length
        else {
          var e = gt + 1
          while (e < b.length && b(e) != '<') e += 1
          if (b.regionMatches(true, e, "</a>", 0, 4)) {
            n += cpLen(b.substring(gt + 1, e)); i = e + 4
          } else i += 1
        }
      } else i += 1
    }
    n
  }

  private def refKeep(b: String): Boolean = {
    val tag = if (b.startsWith("<")) tagRunAt(b, 0) else ""
    val vis = refVisible(b)
    ContentTags(tag) && cpLen(vis) >= TextExtract.MinChars &&
      TextExtract.Den * refLinkChars(b) <= cpLen(vis)
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

  private def divSoup(id: Long) = hexSlice(id, 23, 2) % 10 < 4
  private def hasTable(id: Long) = hexSlice(id, 29, 2) % 10 < 2

  test("every sf0.001 doc: Spark extraction == independent char-walk extraction") {
    assert(htmlById.size == 500)
    htmlById.foreach { case (id, html) =>
      assert(extractedById(id) == refExtract(html), s"doc $id")
    }
  }

  test("boilerplate never leaks: nav/footer/promo/script/style/comment/CDATA text absent") {
    extractedById.values.foreach { t =>
      assert(!t.contains("go 0") && !t.contains("copyright") &&
        !t.contains("buy now") && !t.contains("page "))
      // code and CSS payloads drop whole
      assert(!t.contains("track(") && !t.contains("var t") &&
        !t.contains("color: red"))
      // comments (even with '>' inside) and CDATA markup drop whole
      assert(!t.contains("tracker") && !t.contains("raw junk"))
    }
    // ...and no markup survives tag stripping
    extractedById.values.foreach(t => assert(!t.contains("<a ") && !t.contains("</")))
    // the hazard populations are actually planted
    assert(htmlById.values.count(_.contains("<script>")) > 20)
    assert(htmlById.values.count(_.contains("<style>")) > 20)
    assert(htmlById.values.count(_.contains("<!-- hidden > tracker ")) > 20)
    assert(htmlById.values.count(_.contains("<![CDATA[")) > 20)
  }

  test("round trip: a clean two-para doc reassembles to the original text") {
    val texts = docs.as[(Long, String)].collect().toMap
    val clean = htmlById.keys.filter { id =>
      hexSlice(id, 13, 2) % 10 != 7 && hexSlice(id, 13, 2) % 10 != 3 &&
        hexSlice(id, 17, 2) % 10 != 8 &&
        hexSlice(id, 9, 2) % 10 >= 3 && // no inline anchor (its density can drop a short para1)
        hexSlice(id, 27, 2) % 10 != 4 && hexSlice(id, 27, 2) % 10 != 6 &&
        hexSlice(id, 31, 2) % 10 != 5 && // no entity suffixes
        !divSoup(id) && !hasTable(id) // no extra li/td content blocks
    }
    assert(clean.nonEmpty)
    clean.foreach { id =>
      assert(extractedById(id).replace("\n", " ") == texts(id), s"doc $id")
    }
  }

  test("mixed-case tags segment identically to lowercase") {
    val mixed = htmlById.keys.filter(id => hexSlice(id, 21, 2) % 10 < 3)
    assert(mixed.nonEmpty)
    mixed.foreach { id =>
      assert(htmlById(id).contains("<NAV>") &&
        (htmlById(id).contains("<P>") || hexSlice(id, 17, 2) % 10 == 8 &&
          htmlById(id).contains("<P></P>")), s"doc $id")
      // uppercase nav boilerplate still drops; uppercase <P> content still kept
      assert(!extractedById(id).contains("go 0"), s"doc $id")
      if (hexSlice(id, 17, 2) % 10 != 8)
        assert(extractedById(id).nonEmpty, s"doc $id")
    }
  }

  test("div-soup pages extract: div/li content kept, 1-char li dropped") {
    val dv = htmlById.keys.filter(id => divSoup(id) && hexSlice(id, 17, 2) % 10 != 8)
    assert(dv.nonEmpty)
    dv.foreach { id =>
      assert(htmlById(id).contains("<div>") && htmlById(id).contains("<ul><li>"))
      assert(extractedById(id).contains("item alpha "), s"doc $id")
      // the too-short second <li>x never appears as its own line
      assert(!extractedById(id).split('\n').contains("x"), s"doc $id")
    }
  }

  test("table rows extract: the long <td> kept, the 1-char <td> dropped") {
    val tb = htmlById.keys.filter(hasTable)
    assert(tb.nonEmpty)
    tb.foreach { id =>
      assert(extractedById(id).contains("cell data "), s"doc $id")
      assert(!extractedById(id).split('\n').contains("x"), s"doc $id")
    }
  }

  test("planted hazards all present and handled") {
    val entity = htmlById.keys.filter(id => hexSlice(id, 13, 2) % 10 == 7 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(entity.nonEmpty)
    entity.foreach(id => assert(extractedById(id).contains("x < y & z"), s"doc $id"))

    val entityNum = htmlById.keys.filter(id => hexSlice(id, 13, 2) % 10 == 3 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(entityNum.nonEmpty)
    entityNum.foreach(id =>
      assert(extractedById(id).contains("q < r & s \"t'"), s"doc $id"))

    // arbitrary numeric entities: rsquo + em-dash, decoded via conv→UTF-32
    val entArb = htmlById.keys.filter(id => hexSlice(id, 27, 2) % 10 == 4 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(entArb.nonEmpty)
    entArb.foreach(id =>
      assert(extractedById(id).contains("a’b — c"), s"doc $id"))

    // non-BMP numeric entity: the emoji decodes to its astral codepoint
    val entAstral = htmlById.keys.filter(id => hexSlice(id, 27, 2) % 10 == 6 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(entAstral.nonEmpty)
    entAstral.foreach(id =>
      assert(extractedById(id).contains("e" + new String(Character.toChars(0x1F600)) + "f"),
        s"doc $id"))

    // unknown named entity passes through literally; &amp; decodes once
    val entUnknown = htmlById.keys.filter(id => hexSlice(id, 31, 2) % 10 == 5 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(entUnknown.nonEmpty)
    entUnknown.foreach(id =>
      assert(extractedById(id).contains("AT&T &blorf; rights"), s"doc $id"))

    // the extended named table decodes in content: copy/mdash + the
    // accent pair inside a word (dÉjÀ-shape)
    val entNamed = htmlById.keys.filter(id => hexSlice(id, 13, 2) % 10 == 7 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(entNamed.nonEmpty)
    entNamed.foreach { id =>
      val t = extractedById(id)
      assert(t.contains("x < y & z © — déjà"), s"doc $id")
    }

    // empty-content docs extract to '' unless a planted li/td block adds text
    val empty = htmlById.keys.filter(id => hexSlice(id, 17, 2) % 10 == 8 &&
      !divSoup(id) && !hasTable(id))
    assert(empty.nonEmpty)
    empty.foreach(id => assert(extractedById(id) == "", s"doc $id"))

    val malformed = htmlById.keys.filter(id => hexSlice(id, 15, 2) % 10 == 9)
    assert(malformed.nonEmpty)
    malformed.foreach { id =>
      assert(htmlById(id).toLowerCase.contains("<nav><a") &&
        !htmlById(id).toLowerCase.contains("</nav>"))
      if (hexSlice(id, 17, 2) % 10 != 8)
        assert(extractedById(id).nonEmpty, s"doc $id") // unclosed tags never kill content
    }

    val inline = htmlById.keys.filter(id => hexSlice(id, 9, 2) % 10 < 3 &&
      hexSlice(id, 17, 2) % 10 != 8)
    assert(inline.nonEmpty)
    inline.foreach(id => assert(htmlById(id).contains("""<a href="/w">"""), s"doc $id"))
  }

  test("keep rule: density + tag-set edge cases decided exactly at the 1/3 boundary") {
    val mk = Seq(
      (1L, "<p>abcdef</p>"), // no links, kept
      (2L, """<p><a href="/x">ab</a>cdef</p>"""), // 2 link of 6 visible: 6<=6 kept
      (3L, """<p><a href="/x">abc</a>def</p>"""), // 3 of 6: 9>6 dropped
      (4L, "<p>a</p>"), // too short
      (5L, "<nav>plenty of visible text here</nav>"), // wrong tag
      (6L, """<p><a href="/x">abc</a> unclosed <a href="/y">zz</p>"""), // 2nd anchor never closes -> only abc counts: 9 <= 15 kept
      (7L, "<div>some div content</div>"), // div is content-eligible
      (8L, "<li>ab</li>"), // exactly MinChars, kept
      (9L, "<P>UPPER case para</P>"), // mixed case, kept
      (10L, """<DIV><A HREF="/x">abcdefgh</A> xx</DIV>"""), // 8 link of 11: 24>11 dropped
      (11L, "<td>cell text</td>"), // td eligible, kept
      (12L, "<pre>code block text</pre>")) // pre opens a block but is NOT content
      .toDF("doc_id", "html")
    val eligible = Set("p", "div", "li", "td", "th", "blockquote")
    val got = TextExtract.blocks(mk).as[(Long, Long, String, Long, Long, Boolean)]
      .collect().filter(r => eligible(r._3)).map(r => r._1 -> r._6).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      6L -> true, 7L -> true, 8L -> true, 9L -> true, 10L -> false, 11L -> true))
    // and the char-walk agrees on every one of them
    mk.as[(Long, String)].collect().foreach { case (id, h) =>
      val blk = refBlocks(h).head
      if (id != 5L && id != 12L) assert(refKeep(blk) == got(id), s"case $id")
      if (id == 5L || id == 12L) assert(!refKeep(blk), s"case $id")
    }
  }

  test("single-pass decode: pre-escaped entities never double-unescape") {
    val mk = Seq(
      (1L, "<p>x &amp;#60; y</p>"), // &amp;#60; -> literal &#60;
      (2L, "<p>x &amp;lt; y</p>"), // &amp;lt; -> literal &lt;
      (3L, "<p>bad &#xFFFFFF; cp</p>"), // out-of-range -> U+FFFD
      (4L, "<p>surr &#55296; cp</p>")) // surrogate -> U+FFFD
      .toDF("doc_id", "html")
    val got = TextExtract.extract(mk)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "x &#60; y")
    assert(got(2L) == "x &lt; y")
    assert(got(3L) == "bad � cp")
    assert(got(4L) == "surr � cp")
    // char-walk twin agrees
    mk.as[(Long, String)].collect().foreach { case (id, h) =>
      assert(refExtract(h) == got(id), s"case $id")
    }
  }
}
