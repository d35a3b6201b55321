package graft

import graft.functions.TextOps
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks (SURVEY.md §5.4) for the driver-side text tier —
  * pure Scala, no SparkSession, so ScalaCheck can hammer them.
  */
object TextOpsProps extends Properties("TextOps") {

  val anyText: Gen[String] = Gen.frequency(
    4 -> Gen.asciiPrintableStr,
    2 -> Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar, Gen.const(' ')))
      .map(_.mkString),
    1 -> Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString))

  property("filterText output alphabet is [a-z0-9 \\s]") =
    Prop.forAll(anyText) { s =>
      TextOps.filterTextScala(s).forall(c =>
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c.isWhitespace)
    }

  property("filterText drops all-digit words and 4x-repeat words") =
    Prop.forAll(Gen.chooseNum(0, 99999), Gen.alphaLowerChar) { (n, c) =>
      val repeated = s"$c$c$c$c"
      val out = TextOps.tokenizeScala(TextOps.filterTextScala(s"$n keepme $repeated"))
      out == Seq("keepme")
    }

  property("tokenizeScala yields no empty and no all-digit tokens") =
    Prop.forAll(anyText) { s =>
      val toks = TextOps.tokenizeScala(TextOps.filterTextScala(s))
      toks.forall(w => w.nonEmpty && !w.forall(_.isDigit))
    }

  /** NOT idempotent on arbitrary input — faithfully so: a stripped word
    * char (e.g. '_' in "2_m") masks the \b guarding the reference's
    * all-digit drop (Vocabulary.java:120), so "2" survives pass 1 and only
    * a hypothetical second pass would drop it. The reference runs the
    * filter exactly once per document; we replicate. Idempotence DOES hold
    * on the output alphabet, where \b can't be masked:
    */
  val alphabetText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar, Gen.const(' ')))
      .map(_.mkString)

  property("filterText is idempotent on [a-z0-9 ] input") =
    Prop.forAll(alphabetText) { s =>
      val once = TextOps.filterTextScala(s)
      TextOps.filterTextScala(once) == once
    }
}
