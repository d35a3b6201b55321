package graft

import org.scalatest.funsuite.AnyFunSuite

/** Decision-level coverage for the PII family: known strings detect with
  * exact counts, redaction scrubs them to typed placeholders (and is
  * idempotent — a second pass over scrubbed text finds nothing), the
  * dash-shaped patterns never cross-fire (a phone is not an id), and the
  * planted fixture leaves a clean control slice untouched.
  */
class PiiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.Pii

  private val docs = Seq(
    (1L, "hello user42@mail3.example.com and 555-123-4567 end"),
    (2L, "ip 10.0.255.7 id 123-45-6789"),
    (3L, "no pii here just words"),
    (4L, "two mails a@b.io c.d@e-f.org and 555-000-0001"),
    // adversarial: digit runs that must NOT fire the dash patterns
    (5L, "order 1234-56-7890 ref w555-123-4567x net 192.168.0.1"))
    .toDF("doc_id", "text")

  test("detect: exact per-type counts, no cross-fire between dash shapes") {
    val d = Pii.detect(docs).as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(d(0) == ((1L, 1L, 1L, 0L, 0L, true)))
    assert(d(1) == ((2L, 0L, 0L, 1L, 1L, true)))
    assert(d(2) == ((3L, 0L, 0L, 0L, 0L, false)))
    assert(d(3) == ((4L, 2L, 1L, 0L, 0L, true)))
    // doc 5: "1234-56-7890" never matches the id shape (\b cannot fall
    // inside the 4-digit run), "w555-…" has no boundary before 555, and
    // 192.168.* is outside the planted 10.* space — all four detectors
    // must stay silent.
    assert(d(4) == ((5L, 0L, 0L, 0L, 0L, false)))
  }

  test("redact: placeholders in, PII out, idempotent") {
    val r = Pii.redact(docs).as[(Long, String)].collect().sortBy(_._1).toMap
    assert(r(1L) == "hello <EMAIL> and <PHONE> end")
    assert(r(2L) == "ip <IP> id <ID>")
    assert(r(3L) == "no pii here just words")
    assert(r(4L) == "two mails <EMAIL> <EMAIL> and <PHONE>")
    // nothing left to find, and a second redaction is a no-op
    val again = Pii.redact(Pii.redact(docs)).as[(Long, String)]
      .collect().sortBy(_._1).toMap
    assert(again == r)
    val post = Pii.detect(Pii.redact(docs))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(post.forall(t => t._2 == 0 && t._3 == 0 && t._4 == 0 && t._5 == 0))
  }

  test("planted: clean control slice untouched, blocks detectable, SQL twin layout") {
    val base = (0L until 200L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val p = Pii.planted(base).as[(Long, String)].collect().toMap
    val det = Pii.detect(Pii.planted(base))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    val clean = p.filter { case (id, t) => t == s"doc $id body" }
    // the %4 gate gives ~25% clean docs; the draw is md5-uniform so the
    // band is wide but nonzero on both sides
    assert(clean.size > 20 && clean.size < 100, s"clean=${clean.size}")
    assert(det.exists(_._2 > 0) && det.exists(_._3 > 0)
      && det.exists(_._4 > 0) && det.exists(_._5 > 0))
    // every non-clean doc appends " contact..." and detection on the
    // planted corpus only ever finds what the block carries: stats totals
    // equal per-doc sums (no accidental matches in the base text)
    assert(p.forall { case (id, t) =>
      t == s"doc $id body" || t.startsWith(s"doc $id body contact") })
    // redacting the planted corpus restores a PII-free string containing
    // only placeholders after the base text
    val red = Pii.redact(Pii.planted(base)).as[(Long, String)].collect()
    assert(red.forall { case (id, t) =>
      t.startsWith(s"doc $id body") &&
        !t.drop(s"doc $id body".length).exists(_.isDigit) })
  }
}
