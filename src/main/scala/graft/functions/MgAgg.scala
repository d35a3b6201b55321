package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries frequent-items summary as a typed `Aggregator`: the
  * buffer is a map of at most `k` (item → residual count) entries —
  * bounded state at every stage, map-side partial included, like KmvAgg
  * and BloomAgg.
  *
  * Update (Misra & Gries 1982): present → increment; absent with a free
  * slot → insert at 1; absent on a full summary → decrement ALL k
  * counters, dropping zeros. The decrement pass costs O(k) but each
  * pass removes k total mass and total mass added is ≤ N, so there are
  * at most N/k passes — amortized O(1) per element.
  *
  * Merge (Agarwal et al., "Mergeable Summaries", 2013): add counts,
  * and if more than k items survive, subtract the (k+1)-th largest
  * count from every item and keep the positive remainder — the same
  * bound as a sequential run.
  *
  * Guarantee (MgSpec asserts it): every residual count underestimates
  * the true count by at most N/(k+1), so EVERY item with true frequency
  * > N/(k+1) is present in the final summary. That superset property is
  * what makes the two-pass exact heavy-hitters query
  * (`Sketch.heavyHitters`) exact: pass 1 finds a candidate superset in
  * bounded state, pass 2 recounts candidates exactly — so the φ-heavy
  * output is provably complete whenever φ > 1/(k+1), without ever
  * shuffling the full token universe.
  */
class MgAgg(val k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"misra-gries needs k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], t: String): Map[String, Long] =
    m.get(t) match {
      case Some(c)              => m.updated(t, c + 1)
      case None if m.size < k   => m.updated(t, 1L)
      case None                 =>
        m.flatMap { case (w, c) => if (c > 1) Some(w -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val s = b.foldLeft(a) { case (acc, (w, c)) => acc.updated(w, acc.getOrElse(w, 0L) + c) }
    if (s.size <= k) s
    else {
      // subtract the (k+1)-th largest count from everything; ≤ k survive
      val d = s.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      s.flatMap { case (w, c) => if (c - d > 0) Some(w -> (c - d)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
