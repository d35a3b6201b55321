package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming twin of Sketch.kmvDistinct: a running approximate
  * DISTINCT-count per group over an unbounded ingest stream, with
  * provably bounded state (exactly k hash values per group, ~8·k bytes —
  * the smallest possible mergeable-distinct state).
  *
  * Why this exists: a 100 TB ingest pipeline wants "distinct URLs /
  * users / doc fingerprints per source so far" as a LIVE signal without
  * storing the identity sets. KMV is the sketch whose merge is exact set
  * algebra (union the k-min sets, re-take the k smallest), so the
  * streaming fold is value-IDENTICAL to the batch sketch over the same
  * rows — SketchStreamSpec gates the final stream state bit-for-bit
  * (n_kept, threshold element, estimate) against `Sketch.kmvDistinct`
  * of the full input, which itself hash-matches the DuckDB XXH64 twin.
  * Approximation error comes from the sketch, never from streaming.
  *
  * Mechanics: keys are hashed IN-PLAN with the same `xxhash64` column
  * function the batch tier uses (so parity is by construction, not by a
  * reimplementation); the state machine only maintains the k smallest
  * distinct hashes in UNSIGNED order (sign-bit flip makes signed sort
  * order match), updating per micro-batch via mapGroupsWithState and
  * emitting one refreshed estimate row per touched group (Update mode).
  * No timeout: a group's sketch lives as long as the query — k longs.
  */
object SketchStreams {

  /** Persistent per-group state: the k smallest distinct signed hashes,
    * kept sorted by unsigned value.
    */
  case class KmvState(kmins: Array[Long])

  /** One refreshed sketch row — same fields (names AND derivations) as
    * the batch `q_kmv_distinct` output.
    */
  case class KmvUpdate(grp: String, n_kept: Long, kth_uh: String, est_distinct: Double)

  private val M64d = math.pow(2, 64)

  /** Unsigned-exact double of a signed-bits 64-bit hash — same correctly-
    * rounded conversion the batch tier gets from DECIMAL(20,0) → DOUBLE.
    */
  private def unsignedDouble(h: Long): Double =
    new java.math.BigDecimal(java.lang.Long.toUnsignedString(h)).doubleValue

  /** floor(x·10⁶ + 0.5)/10⁶ — the Stable.stab IEEE sequence, JVM-side. */
  private def stab6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private[graft] def foldState(prev: Array[Long], incoming: Iterator[Long],
                               k: Int): Array[Long] =
    (prev.iterator ++ incoming).toArray.distinct
      .sortBy(_ ^ Long.MinValue) // sign-bit flip: signed order ≡ unsigned
      .take(k)

  private[graft] def emit(grp: String, kmins: Array[Long], k: Int): KmvUpdate = {
    val nKept = kmins.length
    val kth = kmins.last
    val est =
      if (nKept < k) nKept.toDouble
      else stab6((k - 1).toDouble * M64d / unsignedDouble(kth))
    KmvUpdate(grp, nKept.toLong, java.lang.Long.toUnsignedString(kth), est)
  }

  /** Running KMV distinct sketch per group. `rows` is a streaming
    * DataFrame; keys are hashed with Spark's `xxhash64` (seed 42) before
    * the stateful fold, exactly like the batch tier. Emits one updated
    * (grp, n_kept, kth_uh, est_distinct) row per touched group per
    * micro-batch — run with OutputMode.Update.
    */
  def kmvStream(rows: DataFrame, groupCol: String, keyCol: String,
                k: Int): Dataset[KmvUpdate] = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    import rows.sparkSession.implicits._
    rows
      .select(col(groupCol).cast("string").as("grp"), xxhash64(col(keyCol)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (grp: String, it: Iterator[(String, Long)], state: GroupState[KmvState]) => {
          val merged = foldState(
            state.getOption.map(_.kmins).getOrElse(Array.empty[Long]),
            it.map(_._2), k)
          state.update(KmvState(merged))
          emit(grp, merged, k)
        })
  }
}
