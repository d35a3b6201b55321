package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric determinism helpers.
  *
  * The correctness gate hash-compares our parquet output against DuckDB
  * running "the same" SQL. Floating-point aggregation order is
  * non-deterministic in both engines, so a raw `sum(double)` over 60k rows
  * can differ in the last few ulps between runs/engines. Two remedies, both
  * of which reduce to IEEE-754 ops that Spark and DuckDB implement
  * identically:
  *
  *  - `dsum`: cast each element to an exact DECIMAL *before* summing.
  *    Decimal addition is exact and order-independent; one final
  *    decimal→double conversion is deterministic. Use for sums of
  *    fixed-point-ish columns (prices, quantities).
  *
  *  - `stab`: floor(x·10^d + 0.5)/10^d. Not "rounding" in either engine's
  *    library sense — a fixed sequence of IEEE double ops (mul, add, floor,
  *    div) that both engines execute bit-identically, collapsing last-ulp
  *    noise. Use for small-cardinality double sums (per-doc scores, cosines)
  *    where a decimal cast of intermediates is awkward.
  *
  * SQL twins are in the oracle strings: `CAST(sum(CAST(x AS DECIMAL(18,s)))
  * AS DOUBLE)` and `floor(x*1e<d>+0.5)/1e<d>`.
  */
object Stable {

  /** Order-independent exact sum via decimal, surfaced as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** IEEE-deterministic fixed-point collapse of last-ulp noise. */
  def stab(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Driver-side twin of `stab(c, 6)` — THE canonical JVM copy: every
    * driver-arithmetic replication (stationary, PCA eigen rounds, LR
    * weight updates, pHash coefficients) must fold the same IEEE
    * sequence as the Column expression, so they all call this instead of
    * re-spelling it (a divergent copy would silently desynchronize a
    * gate — closing-review finding).
    */
  def stab6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Driver-side twin of `stab(c, 12)` — the PROBABILITY grid (the soft-EM
    * lattice runs in probability space, where the stab(6) grid would
    * crush small piece probabilities; 12 digits keeps ~6 significant
    * digits at p ≈ 10⁻⁶). Headroom contract: x ≤ 1 (x·10¹² < 2⁵³).
    */
  def stab12(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12

  /** SQL twin of `stab` for oracle strings. */
  def stabSql(expr: String, digits: Int): String = {
    val p = "1" + ("0" * digits) + ".0"
    s"floor(($expr)*$p+0.5)/$p"
  }

  /** SQL twin of `dsum`. The final decimal→double hop goes through VARCHAR:
    * DuckDB's direct DECIMAL→DOUBLE cast computes (double)int128 / 10^scale
    * — TWO rounding steps, which can land one ulp off the correctly-rounded
    * value once the sum's integer representation exceeds 2^53 (first seen
    * at sf1.0, where q1_agg's sum_charge ≈ 2.8e16 in units of 1e-6).
    * Spark's Decimal.toDouble (BigDecimal.doubleValue) and DuckDB's
    * VARCHAR→DOUBLE (strtod) are both correctly rounded single steps, so
    * the string hop makes the twin exact at every magnitude — and is a
    * no-op wherever the direct cast already agreed.
    */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(CAST(sum(CAST(($expr) AS DECIMAL(18,$scale))) AS VARCHAR) AS DOUBLE)"

  /** Exact order-free mean of `x` over `n` rows, stab(6)'d, via scale-8
    * fixed-point int64: floor(x·10⁸ + 0.5) is an exact integer-valued
    * double in both engines, and the long sum is exact, order-free, and
    * stays on the codegen'd fast path — unlike a DECIMAL(28,12) element
    * cast, whose > 18-digit buffer drops Spark to boxed BigDecimal
    * updates (measured ~12 µs/row; this is ~ns/row). The 5·10⁻⁹
    * quantization floor sits two digits under the stab(6) output
    * resolution. Headroom contract: n·max|x|·10⁸ < 2⁶³ (≈ 10¹²
    * unit-scale rows) — beyond it, shard the sum or drop a scale digit.
    */
  def fixMean(x: Column, n: Column): Column =
    stab((sum(floor(x * lit(1e8) + lit(0.5)).cast("long")).cast("double") / lit(1e8)) / n, 6)

  /** SQL twin of `fixMean`: DuckDB's round-half-even BIGINT cast and
    * Spark's truncating one agree on floor's integer-valued doubles; the
    * VARCHAR hop is the correctly-rounded HUGEINT→DOUBLE path.
    */
  def fixMeanSql(expr: String): String =
    stabSql(s"(CAST(CAST(sum(CAST(floor(($expr)*100000000.0+0.5) AS BIGINT)) AS VARCHAR) AS DOUBLE)" +
      " / 100000000.0) / count(*)", 6)
}
