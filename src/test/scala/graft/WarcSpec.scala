package graft

import org.scalatest.funsuite.AnyFunSuite

/** Warc verified against an INDEPENDENT hand parser (plain Scala, no
  * regex on the framing path, no Spark): every sf0.001 blob must parse
  * to the same records, canonicalization is pinned case-by-case across
  * all 9 planted variants plus adversarial URLs, crawl dedup is
  * brute-forced in Scala, and the decoy pin proves a delimiter split
  * CANNOT parse these blobs (payloads contain "WARC/1.0") while the
  * Content-Length walk does.
  */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.sources.Warc
  import graft.operators.TextExtract

  // ---- independent reference: a hand-rolled framing walk -----------------

  private case class Rec(wtype: String, url: String, wdate: String,
      clen: Long, body: String, ok: Boolean)

  private def hdrVal(hdrs: String, name: String): String =
    hdrs.split("\r\n").find(_.startsWith(name + ": "))
      .map(_.substring(name.length + 2)).getOrElse("")

  private def refParse(blob: String, cap: Int = 2): Seq[Rec] = {
    val out = collection.mutable.ArrayBuffer[Rec]()
    var off = 0
    while (off < blob.length && out.size < cap) {
      val rest = blob.substring(off)
      val he = rest.indexOf("\r\n\r\n")
      if (he < 0) { out += Rec("", "", "", -1, "", ok = false); off = blob.length }
      else {
        val hdrs = rest.substring(0, he)
        val clenS = hdrVal(hdrs, "Content-Length")
        val clen = if (clenS.matches("[0-9]+")) clenS.toLong else -1L
        val body = if (clen >= 0)
          rest.substring(he + 4, math.min(rest.length, he + 4 + clen.toInt))
        else ""
        val ok = rest.startsWith("WARC/1.0\r\n") && clen >= 0 &&
          body.getBytes("UTF-8").length == clen
        out += Rec(hdrVal(hdrs, "WARC-Type"), hdrVal(hdrs, "WARC-Target-URI"),
          hdrVal(hdrs, "WARC-Date"), clen, body, ok)
        off += he + 4 + clen.toInt + 4
      }
    }
    out.toSeq
  }

  /** Hand percent-normalize: decode unreserved %XX, uppercase the rest. */
  private def refPct(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    def hex(c: Char) = c.isDigit || ('a' to 'f').contains(c) || ('A' to 'F').contains(c)
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) && hex(s.charAt(i + 2))) {
        val c = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        val unres = (c >= 48 && c <= 57) || (c >= 65 && c <= 90) ||
          (c >= 97 && c <= 122) || Set(45, 46, 95, 126).contains(c)
        if (unres) sb += c.toChar
        else sb ++= "%" + s.substring(i + 1, i + 3).toUpperCase
        i += 3
      } else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }

  /** Hand dot-segment fold: '.'/'' skip, '..' pops, else appends. */
  private def refDotFold(p: String): String = {
    val acc = p.split("/", -1).foldLeft("") { (a, s) =>
      if (s == "" || s == ".") a
      else if (s == "..") a.replaceAll("/[^/]*$", "")
      else a + "/" + s
    }
    if (acc == "") "/" else acc
  }

  /** Independent canonicalizer (java.net-free, hand string walk). */
  private def refCanon(u: String): String = {
    val noFrag = u.takeWhile(_ != '#')
    val si = noFrag.indexOf("://")
    val scheme = noFrag.substring(0, si).toLowerCase
    val rest0 = noFrag.substring(si + 3)
    val qi0 = rest0.indexOf('?')
    val sl0 = rest0.indexOf('/')
    val rest = // host-adjacent '?' — insert the missing path slash
      if (qi0 >= 0 && (sl0 < 0 || qi0 < sl0))
        rest0.substring(0, qi0) + "/" + rest0.substring(qi0)
      else rest0
    val slash = rest.indexOf('/')
    val hostPort = (if (slash < 0) rest else rest.substring(0, slash)).toLowerCase
    val host =
      if (scheme == "http" && hostPort.endsWith(":80")) hostPort.dropRight(3)
      else if (scheme == "https" && hostPort.endsWith(":443")) hostPort.dropRight(4)
      else hostPort
    val pathQ0 = if (slash < 0) "" else rest.substring(slash)
    val pathQ = if (pathQ0.isEmpty) "/" else pathQ0
    val qi = pathQ.indexOf('?')
    val path = if (qi < 0) pathQ else pathQ.substring(0, qi)
    val query = refPct(if (qi < 0) "" else pathQ.substring(qi + 1))
    val kept = query.split("&").filter { p =>
      val name = p.takeWhile(_ != '=')
      p.nonEmpty && !name.startsWith(Warc.TrackingPrefix) &&
        !Warc.TrackingExact.contains(name)
    }
    val path2 = refDotFold(refPct(path))
    scheme + "://" + host + path2 +
      (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
  }

  // ---- fixtures -----------------------------------------------------------

  private lazy val docs =
    graft.sources.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
  private lazy val blobsById =
    Warc.records(TextExtract.wrapped(docs)).as[(Long, String)].collect().toMap
  private lazy val parsedRows =
    Warc.parse(Warc.records(TextExtract.wrapped(docs)))
      .as[(Long, Long, String, String, String, Long, Long, Boolean, String)]
      .collect()

  test("every sf0.001 blob: Spark framing walk == independent hand parse") {
    assert(blobsById.size == 500)
    val byDoc = parsedRows.groupBy(_._1)
    blobsById.foreach { case (id, blob) =>
      val ref = refParse(blob)
      val got = byDoc(id).sortBy(_._2)
      assert(got.length == 2 && ref.length == 2, s"doc $id")
      got.zip(ref).foreach { case (g, r) =>
        assert(g._3 == r.wtype && g._4 == r.url && g._5 == r.wdate &&
          g._6 == r.clen && g._9 == r.body && g._8 == r.ok, s"doc $id rec ${g._2}")
      }
      assert(ref(0).wtype == "metadata" && ref(1).wtype == "response")
      assert(ref.forall(_.ok), s"doc $id")
    }
  }

  test("decoy pin: payloads contain 'WARC/1.0', so a delimiter split shears " +
    "records — only the Content-Length walk survives") {
    blobsById.values.foreach { blob =>
      // a naive splitter sees >= 3 'records'; the blob holds exactly 2
      assert(blob.sliding("WARC/1.0".length).count(_ == "WARC/1.0") >= 3)
      assert(refParse(blob).length == 2 && refParse(blob).forall(_.ok))
    }
  }

  test("stream blobs (1..5 records, decoy payloads): the Spark fold walk == " +
    "the independent hand parse, every count exercised") {
    val ids = docs.select($"doc_id")
    val blobs = Warc.streamRecords(ids).as[(Long, String)].collect().toMap
    val got = Warc.parseStream(Warc.streamRecords(ids))
      .as[(Long, Long, String, String, String, Long, Long, Boolean, String)]
      .collect().groupBy(_._1)
    val counts = collection.mutable.Set[Int]()
    var decoys = 0
    blobs.foreach { case (id, blob) =>
      val ref = refParse(blob, cap = 16)
      counts += ref.length
      decoys += ref.count(_.body.contains("WARC/1.0"))
      val g = got(id).sortBy(_._2)
      assert(g.length == ref.length, s"doc $id: record count")
      g.zip(ref).foreach { case (gr, r) =>
        assert(gr._3 == r.wtype && gr._4 == r.url && gr._5 == r.wdate &&
          gr._6 == r.clen && gr._9 == r.body && gr._8 == r.ok,
          s"doc $id rec ${gr._2}")
      }
      assert(ref.forall(_.ok), s"doc $id")
    }
    assert(counts == Set(1, 2, 3, 4, 5), s"record counts exercised: $counts")
    assert(decoys > 0, "decoy payloads present in the stream fixture")
  }

  test("every planted URL canonicalizes identically in Spark and the hand walk") {
    val got = Warc.urls(docs)
      .select($"doc_id", $"url", Warc.canonicalUrl($"url").as("canon"))
      .as[(Long, String, String)].collect()
    assert(got.length == 500)
    got.foreach { case (id, url, canon) =>
      assert(canon == refCanon(url), s"doc $id: $url")
    }
    // all 9 variants are exercised at n=500
    val variants = got.map { case (id, url, _) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"warc:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(h.substring(12, 14), 16) % 9
    }.toSet
    assert(variants == (0L to 8L).toSet)
  }

  test("canonicalization unit pins: every rule on adversarial URLs") {
    val cases = Seq(
      "HTTP://WWW.Site9.EXAMPLE/d/3" -> "http://www.site9.example/d/3",
      "http://h.example:80/p" -> "http://h.example/p",
      "https://h.example:443/p" -> "https://h.example/p",
      "https://h.example:80/p" -> "https://h.example:80/p", // NOT https' default
      "http://h.example:8080/p" -> "http://h.example:8080/p", // non-default kept
      "http://h.example/p#frag#more" -> "http://h.example/p",
      "http://h.example/p?utm_source=x" -> "http://h.example/p",
      "http://h.example/p?a=1&utm_b=2&c=3&fbclid=z" -> "http://h.example/p?a=1&c=3",
      "http://h.example/p?gclid=1" -> "http://h.example/p",
      "http://h.example/p/q/" -> "http://h.example/p/q",
      "http://h.example/" -> "http://h.example/", // root slash stays
      "http://h.example" -> "http://h.example/", // empty path -> root
      "http://h.example/p?c=2&a=1" -> "http://h.example/p?c=2&a=1", // order preserved
      "http://h.example/p?utmx=1" -> "http://h.example/p?utmx=1", // prefix is utm_, not utm
      // query directly after the host — no path slash at all
      "http://h.example?fbclid=1" -> "http://h.example/",
      "http://H.EXAMPLE?a=1&utm_x=2" -> "http://h.example/?a=1",
      "http://h.example:80?a=1" -> "http://h.example/?a=1",
      // RFC 3986: dot segments, duplicate slashes, percent normalization
      "http://h.example/a/./b/../c" -> "http://h.example/a/c",
      "http://h.example//a//b/" -> "http://h.example/a/b",
      "http://h.example/x/../" -> "http://h.example/",
      "http://h.example/../p" -> "http://h.example/p", // '..' clamps at root
      "http://h.example/%7Eu/%41b" -> "http://h.example/~u/Ab",
      "http://h.example/p?q=%41%3a" -> "http://h.example/p?q=A%3A",
      "http://h.example/p?%75tm_source=x" -> "http://h.example/p", // decoded name IS tracking
      "http://h.example/%zz" -> "http://h.example/%zz") // broken triplet passes through
    val df = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    val got = df.select($"doc_id", Warc.canonicalUrl($"url").as("c"))
      .as[(Long, String)].collect().toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i.toLong) == want, s"spark: $u")
      assert(refCanon(u) == want, s"ref: $u")
    }
  }

  test("crawl dedup == brute force (latest wdate, doc_id tie-break) and " +
    "winners only come from ok response records") {
    val fetches = parsedRows.filter(r => r._3 == "response" && r._8)
      .map(r => (refCanon(r._4), r._5, r._1)) // (canon, wdate, doc_id)
    val want = fetches.groupBy(_._1).map { case (u, fs) =>
      val w = fs.maxBy(f => (f._2, f._3))
      (u, w._3, w._2)
    }.toSet
    val got = Warc.dedupLatest(
      Warc.parse(Warc.records(TextExtract.wrapped(docs))))
      .as[(String, Long, String)].collect().toSet
    assert(got == want)
    // the fixture really plants re-fetch groups (fewer canon urls than docs)
    assert(got.size < 500 && got.size > 100)
    // and at least one group had >1 ok fetch (a real dedup happened)
    assert(fetches.groupBy(_._1).exists(_._2.length > 1))
  }
}
