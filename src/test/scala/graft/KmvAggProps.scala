package graft

import graft.functions.KmvAgg
import org.scalacheck.{Gen, Prop, Properties}

/** Property checks for the KMV aggregation buffer — pure JVM, no
  * SparkSession, so ScalaCheck can hammer the branch structure (binary-
  * search insert at head/middle/tail, duplicate rejection, full-buffer
  * rejection, sorted-merge dedup/truncation) that the end-to-end specs
  * only exercise on one data distribution. The model is the obvious
  * spec: the k smallest distinct values in UNSIGNED order.
  */
object KmvAggProps extends Properties("KmvAgg") {

  private def model(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sortBy(_ ^ Long.MinValue).take(k)

  // hashes spanning both sign halves (unsigned order != signed order)
  // with deliberate duplicates
  val hashes: Gen[List[Long]] = Gen.listOf(Gen.frequency(
    3 -> Gen.choose(Long.MinValue, Long.MaxValue),
    2 -> Gen.choose(-4L, 4L),
    1 -> Gen.oneOf(Long.MinValue, Long.MaxValue, 0L, -1L, 1L)))

  val smallK: Gen[Int] = Gen.choose(2, 12)

  property("fold of reduce == k smallest distinct in unsigned order") =
    Prop.forAll(hashes, smallK) { (xs, k) =>
      val agg = new KmvAgg(k)
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      buf.toSeq == model(xs, k)
    }

  property("merge of any split == fold of the whole") =
    Prop.forAll(hashes, smallK, Gen.choose(0, 100)) { (xs, k, cut) =>
      val agg = new KmvAgg(k)
      val at = if (xs.isEmpty) 0 else cut % (xs.size + 1)
      val (a, b) = xs.splitAt(at)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      merged.toSeq == model(xs, k)
    }

  property("merge is commutative") =
    Prop.forAll(hashes, hashes, smallK) { (xs, ys, k) =>
      val agg = new KmvAgg(k)
      val bx = xs.foldLeft(agg.zero)(agg.reduce)
      val by = ys.foldLeft(agg.zero)(agg.reduce)
      // reduce may return its (possibly shared) input; merge too — compare
      // value-wise on fresh folds to avoid aliasing between the two orders
      val agg2 = new KmvAgg(k)
      val bx2 = xs.foldLeft(agg2.zero)(agg2.reduce)
      val by2 = ys.foldLeft(agg2.zero)(agg2.reduce)
      agg.merge(bx, by).toSeq == agg2.merge(by2, bx2).toSeq
    }

  property("buffer never exceeds k and stays sorted-unsigned distinct") =
    Prop.forAll(hashes, smallK) { (xs, k) =>
      val agg = new KmvAgg(k)
      val states = xs.scanLeft(agg.zero)(agg.reduce).map(_.toSeq)
      states.forall { s =>
        s.size <= k && s == s.distinct &&
          s.sortBy((x: Long) => x ^ Long.MinValue) == s
      }
    }

  property("streaming foldState agrees with the aggregator") =
    Prop.forAll(hashes, smallK) { (xs, k) =>
      val agg = new KmvAgg(k)
      val viaAgg = xs.foldLeft(agg.zero)(agg.reduce).toSeq
      val viaStream = graft.streaming.SketchStreams
        .foldState(Array.empty, xs.iterator, k).toSeq
      viaAgg == viaStream
    }
}
