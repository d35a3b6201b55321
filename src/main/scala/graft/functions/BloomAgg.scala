package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bloom filter over 64-bit hashes as a typed `Aggregator` (registered
  * via `functions.udaf`, partial-aggregating like any built-in): the
  * buffer IS the filter — a fixed `numBits`-bit bitset as `Array[Long]`
  * — so merge is a word-wise OR and the shuffle payload is exactly
  * `numBits / 8` bytes per partial, independent of input cardinality.
  * This is the membership half of the classic runtime-filter pattern
  * (Bloom 1970; the same shape Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injects): build once over
  * the big side's keys, then let a cheap `mightContain` probe decide
  * which rows ever reach an exact join.
  *
  * Bit positions come from Kirsch–Mitzenmacher double hashing (2006):
  * the input is already a full-entropy xxhash64 value, so its two
  * 32-bit halves serve as (h1, h2) and position i is
  * `h1 + i·h2 (mod numBits)` with h2 forced odd (numBits is a power of
  * two, so an odd stride visits every slot). Both the batch probe and
  * the streaming twin call the same `BloomAgg.mightContain`, so "set"
  * and "test" can never disagree on the position sequence.
  *
  * Guarantees (BloomSpec): NO false negatives — every inserted hash
  * tests positive in the filter and in any OR-merge that includes it
  * (the theorem the exactness of `Dedup.bloomNovelDocs` stands on) —
  * and the false-positive rate at load n is ≈ (1 − e^(−kn/m))^k, spec-
  * measured under its textbook bound. OR is commutative/associative/
  * idempotent, so the result is independent of partitioning and merge
  * order.
  */
class BloomAgg(val numBits: Int, val numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def zero: Array[Long] = Array.empty // allocate on first insert

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val b = if (buf.isEmpty) new Array[Long](numBits >>> 6) else buf
    BloomAgg.set(b, numHashes, h)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.isEmpty) new Array[Long](numBits >>> 6) else buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomAgg {

  /** The i-th bit position for hash `h` (Kirsch–Mitzenmacher): h1 + i·h2
    * over the word, masked to the power-of-two bit range.
    */
  @inline private def pos(h: Long, i: Int, mask: Int): Int = {
    val h1 = h.toInt
    val h2 = (h >>> 32).toInt | 1 // odd stride covers all slots of a pow-2 table
    (h1 + i * h2) & mask
  }

  /** Set all `k` positions of `h` in `bits` (mutates). */
  def set(bits: Array[Long], k: Int, h: Long): Unit = {
    val mask = (bits.length << 6) - 1
    var i = 0
    while (i < k) {
      val p = pos(h, i, mask)
      bits(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
  }

  /** Test all `k` positions of `h` in `bits`: false ⇒ definitely never
    * inserted (the no-false-negative direction); true ⇒ inserted or a
    * false positive.
    */
  def mightContain(bits: Array[Long], k: Int, h: Long): Boolean = {
    val mask = (bits.length << 6) - 1
    var i = 0
    while (i < k) {
      val p = pos(h, i, mask)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
