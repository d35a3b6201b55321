package graft.operators

import graft.functions.Stable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sketches — the hash-gated siblings of the engine-native
  * approximate aggregates (`q_approx_sketches`' HLL++/KLL).
  *
  * `approx_count_distinct`'s HLL++ registers are an engine implementation
  * detail, so that query can never hash-match a DuckDB twin. KMV
  * (k-minimum-values, Bar-Yossef et al. 2002) has the opposite property:
  * the sketch IS k concrete hash values, so two engines that agree on the
  * hash function agree on the whole sketch bit-for-bit. With XxhashSql
  * replaying Spark's xxhash64 in DuckDB, the KMV tier runs under the same
  * exact hash gate as every other query — an approximate DISTINCT whose
  * sketch state, threshold element, and estimate are all cross-engine
  * checkable.
  *
  * Scale shape: this is the mergeable-sketch pattern at its purest. The
  * per-partition stage keeps only the k smallest hashes it sees (bounded
  * state, map-side), the merge stage re-sorts k·P candidates down to k per
  * group — no stage ever holds more than k values per (group, partition).
  * At 100 TB the same two-level shape runs as partial/final aggregation;
  * the estimate ((k−1)·2⁶⁴ ⁄ h₍ₖ₎) is driver-free arithmetic on the final
  * k-row state.
  */
object Sketch {

  /** 2⁶⁴ as an exact decimal — the unsigned-domain modulus. */
  private val M64 = new java.math.BigDecimal("18446744073709551616")

  /** KMV distinct-count sketch per group over `key` (a BIGINT column —
    * hashed with Spark's `xxhash64`, seed 42, the form XxhashSql replays).
    *
    * Output per group: `n_kept` (min(k, distinct hashes seen) — when
    * < k the group was exhausted and the "estimate" is exact), `kth_uh`
    * (the k-th smallest unsigned hash, as a string: the sketch's
    * threshold element, the exact cross-engine anchor), and
    * `est_distinct` = (k−1)·2⁶⁴ ⁄ h₍ₖ₎ stab(6)'d (both factors are
    * exactly-representable doubles; the division is one IEEE op).
    *
    * Distinctness is taken over HASH values (KMV set semantics): a 64-bit
    * collision merges two keys identically in both engines.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, key: Column, k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val h = xxhash64(key)
    val uh = when(h < 0, h.cast(DecimalType(20, 0)) + lit(M64))
      .otherwise(h.cast(DecimalType(20, 0)))
      .cast(DecimalType(20, 0))
    val hashed = df.select(col(groupCol), uh.as("uh"))
    // Two-level k-min: per-partition k smallest distinct (bounded merge
    // candidates), then the global k smallest per group. The union of
    // partition-wise k-minima is a superset of the global k-minima, so
    // this is exact. Dedup rides collect_set at BOTH levels instead of a
    // standalone .distinct() — a distinct would shuffle every input row,
    // while here only k values per (group, input-partition) reach the
    // exchange (a cross-partition duplicate survives level 1 and dies in
    // level 2's set).
    val partial = hashed
      .groupBy(col(groupCol), spark_partition_id().as("pid"))
      .agg(slice(array_sort(collect_set(col("uh"))), 1, k).as("part"))
      .select(col(groupCol), explode(col("part")).as("uh"))
    val kRow = lit((k - 1).toDouble * math.pow(2, 64)) // 63·2⁶⁴: exact double
    partial.groupBy(groupCol)
      .agg(slice(array_sort(collect_set(col("uh"))), 1, k).as("kmins"))
      .select(col(groupCol),
        size(col("kmins")).cast("long").as("n_kept"),
        expr("element_at(kmins, size(kmins))").as("kth"))
      .select(col(groupCol), col("n_kept"),
        col("kth").cast("string").as("kth_uh"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(Stable.stab(kRow / col("kth").cast("double"), 6))
          .as("est_distinct"))
  }
}
