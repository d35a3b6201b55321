package graft

import graft.functions.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the reference's filterText (Vocabulary.java:118-121) — the
  * subtlest single piece of logic in the reference (SURVEY.md §5.1). The
  * expected values below are what the reference's own
  * `raw.toLowerCase().replaceAll(regex, " ")` produces (same Java regex
  * engine → same semantics).
  */
class TextOpsSpec extends AnyFunSuite {

  test("filterText lowercases and strips punctuation") {
    assert(TextOps.filterTextScala("Hello, World!") == "hello  world ")
  }

  test("filterText drops words with a char repeated 4+ times consecutively") {
    assert(TextOps.filterTextScala("aaaa") == " ")
    assert(TextOps.filterTextScala("cool coooool") == "cool ")
    assert(TextOps.filterTextScala("mississippi") == "mississippi") // no 4-run
    assert(TextOps.filterTextScala("aaab aaaab") == "aaab ")
    // digits count as repeatable chars too
    assert(TextOps.filterTextScala("x1111y ok") == "  ok")
  }

  test("filterText drops all-digit words but keeps alphanumerics") {
    assert(TextOps.filterTextScala("call 911 now") == "call  now")
    assert(TextOps.filterTextScala("b2b 42 x86") == "b2b  x86")
  }

  test("filterText strips non-latin and symbols") {
    assert(TextOps.filterTextScala("naïve café") == "na ve caf ")
    assert(TextOps.filterTextScala("läuft") == "l uft")
    assert(TextOps.filterTextScala("") == "")
    assert(TextOps.filterTextScala("приём") == "     ")
  }

  test("filterText output alphabet is [a-z0-9 ] (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(40))
        .map(_ => (rnd.nextInt(95) + 32).toChar).mkString
      assert(TextOps.filterTextScala(s).forall(c =>
        c == ' ' || c.isDigit || ('a' to 'z').contains(c)), s"input: $s")
    }
  }

  test("tokenizeScala drops empties and all-digit words") {
    assert(TextOps.tokenizeScala("  the  good  person ") ==
      Seq("the", "good", "person"))
    assert(TextOps.tokenizeScala("a 42 b2b") == Seq("a", "b2b"))
  }

  test("distributed filterText matches driver-side twin") {
    val spark = TestSpark.spark
    import spark.implicits._
    val samples = Seq("Hello, World!", "cool coooool", "call 911 now",
      "naïve café", "b2b 42 x86", "MiXeD CaSe 1234 ok")
    val viaSpark = samples.toDF("t")
      .select(TextOps.filterText(org.apache.spark.sql.functions.col("t")))
      .as[String].collect().toSeq
    assert(viaSpark == samples.map(TextOps.filterTextScala))
  }
}
