package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import java.security.MessageDigest

/** One-pass MinHash signature as a typed `Aggregator` — the public custom-
  * aggregate API (registered via `functions.udaf`, participates in partial
  * aggregation like any built-in: update per shingle, merge = element-wise
  * min of buffers).
  *
  * Produces the identical signature to the 12-expression-column
  * formulation in Dedup.minhashSignatures (same md5, same two 60-bit
  * slices per digest — MinHashAggSpec cross-checks them value-for-value),
  * but carries ONE Array[Long] buffer through the shuffle instead of
  * `numHashes` separate agg buffers, and computes each digest exactly once
  * per row without relying on codegen subexpression elimination.
  */
class MinHashAgg(val numHashes: Int) extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val md = MessageDigest.getInstance("MD5")
    var seed = 0
    while (seed * 2 < numHashes) {
      val d = md.digest(s"$seed:$shingle".getBytes("UTF-8"))
      // same slices as Dedup.minhashCol: hex chars 1-15 / 17-31 (1-indexed)
      val lo = slice60(d, 0)  // nibbles 0..14
      val hi = slice60(d, 16) // nibbles 16..30
      val i = seed * 2
      if (lo < buf(i)) buf(i) = lo
      if (i + 1 < numHashes && hi < buf(i + 1)) buf(i + 1) = hi
      seed += 1
    }
    buf
  }

  /** Value of the 15 nibbles starting at nibble index `start`. */
  private def slice60(d: Array[Byte], start: Int): Long = {
    var v = 0L
    var n = start
    val end = n + 15
    while (n < end) {
      val b = d(n / 2) & 0xff
      val nib = if (n % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      n += 1
    }
    v
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
