package graft

import graft.functions.{BloomAgg, MgAgg}
import org.scalacheck.{Gen, Prop, Properties}

/** Property checks for the Bloom and Misra–Gries aggregation buffers —
  * pure JVM, no SparkSession. The load-bearing claims:
  *
  *   - Bloom has NO false negatives, under any split/merge order — the
  *     theorem `Dedup.bloomNovelDocs`' exactness stands on (a false
  *     negative would skip the exact verify and emit a duplicate).
  *   - Misra–Gries underestimates any item's count by at most N/(k+1),
  *     merged or sequential — so items above that frequency are always
  *     in the summary, which is what makes `Sketch.heavyHitters`'
  *     candidate set a provable superset and its recount exact.
  */
object BloomMgProps extends Properties("BloomMg") {

  // ---- Bloom ----

  val hashes: Gen[List[Long]] = Gen.listOf(Gen.frequency(
    3 -> Gen.choose(Long.MinValue, Long.MaxValue),
    1 -> Gen.oneOf(Long.MinValue, Long.MaxValue, 0L, -1L, 1L)))

  // small filters on purpose: saturation exercises every word/bit path
  val bloomBits: Gen[Int] = Gen.oneOf(64, 128, 1024)
  val bloomK: Gen[Int] = Gen.choose(1, 7)

  property("bloom: no false negatives after any fold") =
    Prop.forAll(hashes, bloomBits, bloomK) { (xs, m, k) =>
      val agg = new BloomAgg(m, k)
      val bits = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      xs.forall(h => BloomAgg.mightContain(bits, k, h))
    }

  property("bloom: merge of any split still contains every element") =
    Prop.forAll(hashes, bloomBits, bloomK, Gen.choose(0, 100)) { (xs, m, k, cut) =>
      val agg = new BloomAgg(m, k)
      val at = if (xs.isEmpty) 0 else cut % (xs.size + 1)
      val (a, b) = xs.splitAt(at)
      val bits = agg.finish(agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce)))
      xs.forall(h => BloomAgg.mightContain(bits, k, h))
    }

  property("bloom: merge result == fold of the whole (bitwise)") =
    Prop.forAll(hashes, bloomBits, bloomK, Gen.choose(0, 100)) { (xs, m, k, cut) =>
      val at = if (xs.isEmpty) 0 else cut % (xs.size + 1)
      val (a, b) = xs.splitAt(at)
      // fresh aggregators per fold: reduce/merge mutate their buffers
      def fold(ys: List[Long]): Array[Long] = {
        val agg = new BloomAgg(m, k)
        agg.finish(ys.foldLeft(agg.zero)(agg.reduce))
      }
      val agg = new BloomAgg(m, k)
      val merged = agg.finish(agg.merge(fold(a), fold(b)))
      merged.sameElements(fold(xs))
    }

  // ---- Misra–Gries ----

  // skewed universes so genuine heavy hitters exist alongside tail noise
  val tokens: Gen[List[String]] = Gen.listOf(Gen.frequency(
    5 -> Gen.oneOf("s0", "s1", "s2"),
    2 -> Gen.choose(0, 30).map(i => s"m$i"),
    2 -> Gen.choose(0, 10000).map(i => s"t$i")))

  val mgK: Gen[Int] = Gen.choose(1, 12)

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  property("mg: residuals bounded by true count and deficient by <= N/(k+1)") =
    Prop.forAll(tokens, mgK) { (xs, k) =>
      val agg = new MgAgg(k)
      val m = xs.foldLeft(agg.zero)(agg.reduce)
      val tc = trueCounts(xs)
      val slack = xs.size.toDouble / (k + 1)
      m.size <= k &&
        m.forall { case (w, c) => c <= tc(w) && tc(w) - c <= slack } &&
        tc.forall { case (w, c) => c <= slack || m.contains(w) } // superset of heavy items
    }

  property("mg: merged split keeps the same guarantees") =
    Prop.forAll(tokens, mgK, Gen.choose(0, 100)) { (xs, k, cut) =>
      val agg = new MgAgg(k)
      val at = if (xs.isEmpty) 0 else cut % (xs.size + 1)
      val (a, b) = xs.splitAt(at)
      val m = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      val tc = trueCounts(xs)
      val slack = xs.size.toDouble / (k + 1)
      m.size <= k &&
        m.forall { case (w, c) => c <= tc(w) && tc(w) - c <= slack } &&
        tc.forall { case (w, c) => c <= slack || m.contains(w) }
    }

  property("mg: three-way merge associativity keeps the deficiency bound") =
    Prop.forAll(tokens, tokens, tokens, mgK) { (xs, ys, zs, k) =>
      val agg = new MgAgg(k)
      def fold(ws: List[String]) = ws.foldLeft(agg.zero)(agg.reduce)
      val all = xs ++ ys ++ zs
      val tc = trueCounts(all)
      val slack = all.size.toDouble / (k + 1)
      val left = agg.merge(agg.merge(fold(xs), fold(ys)), fold(zs))
      val right = agg.merge(fold(xs), agg.merge(fold(ys), fold(zs)))
      // not bit-identical in general; BOTH orders must keep the bound
      Seq(left, right).forall { m =>
        m.size <= k &&
          m.forall { case (w, c) => c <= tc(w) && tc(w) - c <= slack } &&
          tc.forall { case (w, c) => c <= slack || m.contains(w) }
      }
    }
}
