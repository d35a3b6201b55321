package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** k-minimum-values sketch as a typed `Aggregator` (registered via
  * `functions.udaf`, partial-aggregating like any built-in): the buffer
  * IS the sketch — at most k distinct 64-bit hashes in unsigned order —
  * so state is k·8 bytes at EVERY stage: per-row update, map-side
  * partial, shuffle payload, final merge. This replaces the first
  * formulation's two-level `collect_set` (whose map-side state held all
  * distinct hashes in a partition before the slice) with the textbook
  * bounded-sketch shape; only ≤k values per group ever cross the wire.
  *
  * Inputs are SIGNED xxhash64 outputs; unsigned ordering rides the
  * sign-bit flip (h ^ Long.MinValue preserves unsigned order under
  * signed comparison). Insertion is a binary search + bounded copy (the
  * common case — a hash above the current k-th — is a no-op after the
  * search rejects it at `lo >= k`). Merge is a sorted-merge dedup
  * truncated at k. KMV mergeability (fold of k-min sets ≡ k-min of the
  * union) makes the result independent of partitioning and merge order;
  * ApproxSpec asserts that invariance and SketchStreamSpec the
  * equivalence with the streaming fold.
  */
class KmvAgg(val k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k >= 2, s"kmv needs k >= 2, got $k")

  @inline private def ukey(h: Long): Long = h ^ Long.MinValue

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val kk = ukey(h)
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ukey(buf(mid)) < kk) lo = mid + 1 else hi = mid
    }
    if (lo < buf.length && buf(lo) == h) buf // already in the sketch
    else if (lo >= k) buf                    // not below the k-th smallest
    else {
      val n = math.min(buf.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = h
      System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && ukey(a(i)) <= ukey(b(j)))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
