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
    * The aggregation is ONE hash aggregate over graft.functions.KmvAgg
    * — the buffer IS the sketch (≤k hashes), so state is bounded k·8
    * bytes at every stage (per-row update, map-side partial, shuffle,
    * final merge) and only ≤k values per group cross the wire. The
    * unsigned-decimal conversion happens once, on the k-row output.
    *
    * Distinctness is taken over HASH values (KMV set semantics): a 64-bit
    * collision merges two keys identically in both engines.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, key: Column, k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val kmvU = udaf(new graft.functions.KmvAgg(k))
    val kth = expr("element_at(kmins, size(kmins))")
    val kthDec = when(kth < 0, kth.cast(DecimalType(20, 0)) + lit(M64))
      .otherwise(kth.cast(DecimalType(20, 0)))
      .cast(DecimalType(20, 0))
    val kRow = lit((k - 1).toDouble * math.pow(2, 64)) // 63·2⁶⁴: exact double
    df.select(col(groupCol), xxhash64(key).as("h"))
      .groupBy(groupCol)
      .agg(kmvU(col("h")).as("kmins"))
      .select(col(groupCol),
        size(col("kmins")).cast("long").as("n_kept"),
        kthDec.cast("string").as("kth_uh"),
        when(size(col("kmins")) < k, size(col("kmins")).cast("double"))
          .otherwise(Stable.stab(kRow / kthDec.cast("double"), 6))
          .as("est_distinct"))
  }

  /** Deterministic fixed-register HyperLogLog (Flajolet, Fusy, Gandouet
    * & Meunier 2007) — the gateable sibling of `approx_count_distinct`
    * whose HLL++ registers are engine-internal. Here the ENTIRE sketch
    * is a pure function of xxhash64 (seed 42, the form XxhashSql
    * replays): register index = top `p` bits of the unsigned hash, rank
    * ρ = leading-zero count of the remaining 64−p bits + 1, register =
    * max ρ. So a DuckDB twin re-derives every register, and the estimate
    * is cross-engine exact under stab(6):
    *
    *  - ρ is computed INTEGER-ONLY (no floor(log2) — log2(2⁵⁹−1) rounds
    *    UP to 59.0 in double, an off-by-one at exactly the values that
    *    matter): smear w to 2^bitlen−1 with 6 doubling shifts, then
    *    bit_count = bitlen, ρ = (64−p) − bitlen + 1.
    *  - the harmonic sum Σ 2^−M[j] is kept EXACT as the integer
    *    Σ 2^(maxρ−M[j]) (+ zero registers at 2^maxρ) in DECIMAL(38,0);
    *    the estimate αm²·2^maxρ ⁄ S then needs exactly two double
    *    conversions (the numerator is a power of two — exact) and one
    *    divide — deterministic IEEE in both engines, no
    *    summation-order dependence.
    *  - small-range correction (V zero registers > 0 and E ≤ 2.5m):
    *    linear counting m·ln(m/V); ln differs across libms by ≤ 1 ulp,
    *    invisible under stab(6). The 2⁶⁴/30 large-range correction is
    *    unreachable below ~6·10¹⁷ distinct keys and is omitted.
    *
    * Scale shape: one (group, idx) hash aggregate over the key stream
    * (map-side partial max — registers merge by max, the mergeable-
    * sketch property), then per-group arithmetic over ≤ m=2^p rows; the
    * maxρ window partition is register-bounded, never data-bounded.
    * Output per group: `n_zero_regs`, `max_rho`, `reg_sum` (cross-engine
    * anchors on the register array) and the stab(6) `hll_est`.
    */
  def hllDistinct(df: DataFrame, groupCol: String, key: Column, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"hll p must be in [4,16], got $p")
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val wBits = 64 - p
    val mask = (1L << wBits) - 1
    val h = df.select(col(groupCol), xxhash64(key).as("h"))
      .select(col(groupCol),
        shiftrightunsigned(col("h"), wBits).as("idx"),
        col("h").bitwiseAND(lit(mask)).as("w"))
    val smeared = Seq(1, 2, 4, 8, 16, 32).foldLeft(col("w")) {
      (acc, s) => acc.bitwiseOR(shiftright(acc, s))
    }
    val regs = h.select(col(groupCol), col("idx"),
        (lit(wBits + 1) - bit_count(smeared)).cast("long").as("rho"))
      .groupBy(groupCol, "idx").agg(max("rho").as("reg"))
    // ≤ m rows per partition — register-bounded, not data-bounded
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val g = regs.withColumn("maxr", max("reg").over(wg))
      .groupBy(groupCol).agg(
        count(lit(1)).as("np"), max("reg").as("maxr"),
        sum("reg").as("reg_sum"),
        sum(expr("cast(shiftleft(cast(1 as bigint), cast(maxr - reg as int)) as decimal(38,0))"))
          .as("sp"))
    val pow2maxr = expr("cast(shiftleft(cast(1 as bigint), cast(maxr as int)) as decimal(38,0))")
    val v = (lit(m) - col("np")).cast("long")
    val stot = col("sp") + v.cast(DecimalType(38, 0)) * pow2maxr
    val numer = pow2maxr * lit(m.toLong * m)
    val raw = lit(alpha) * (numer.cast("double") / stot.cast("double"))
    val est = when(v > 0 && raw <= lit(2.5 * m),
        lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(raw)
    g.select(col(groupCol), v.as("n_zero_regs"),
      col("maxr").cast("long").as("max_rho"),
      col("reg_sum").cast("long").as("reg_sum"),
      Stable.stab(est, 6).as("hll_est"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) over the token
    * stream — the additive frequency sketch: d hash rows × w counters,
    * cell (r, c) counts every token occurrence whose r-th hash lands on
    * c, and a token's estimate is the MIN over its d cells (always ≥ the
    * true count; over by at most ε·N = (e/w)·N w.p. 1−e⁻ᵈ per probe).
    *
    * Spark-native shape — this is why CMS earns a place next to the
    * exact `groupBy(token)`: the sketch is ONE narrow pass (explode
    * tokens × d rows, hash, groupBy(r, c)) whose partial aggregation
    * collapses each partition to ≤ d·w cells map-side, so the shuffle
    * carries ≤ d·w·P rows no matter the corpus — at 100 TB the exact
    * count shuffles hundreds of millions of distinct tail tokens, the
    * sketch shuffles a few thousand cells. Merging is addition (cell-
    * wise), which is also what makes the streaming twin
    * (SketchStreams.cmsIngest) exact: the committed per-batch sketches
    * sum to the batch sketch of the union, bit for bit. (Conservative
    * update would tighten estimates but breaks mergeability — the
    * trade is documented, not taken.)
    *
    * Determinism: row r's hash is Spark's `xxhash64` (seed 42) of the
    * string "cms<r>:<token>" — the form XxhashSql replays — reduced
    * mod w, so the whole sketch hash-gates against a DuckDB twin.
    * Only occupied cells appear (group-by semantics), identically in
    * both engines.
    */
  def cmsCell(token: Column, r: Column, w: Int): Column =
    pmod(xxhash64(concat(lit("cms"), r.cast("string"), lit(":"), token)),
      lit(w.toLong)).cast("int")

  def cmsSketch(docs: DataFrame, d: Int = 4, w: Int = 256): DataFrame = {
    require(d >= 1 && w >= 2, s"cms needs d >= 1, w >= 2; got d=$d w=$w")
    import graft.functions.TextOps
    docs
      .select(explode(TextOps.splitWords(TextOps.normalize(col("text")))).as("token"))
      .filter(length(col("token")) > 0)
      .select(col("token"), explode(typedLit((0 until d).toList)).as("r"))
      .select(col("r"), cmsCell(col("token"), col("r"), w).as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
  }

  /** CMS honesty card: estimate vs exact count for the `topN` most
    * frequent tokens (ties broken by token — a deterministic probe set).
    * `overcount` = est − exact is ≥ 0 ALWAYS (CMS never undercounts —
    * SketchSpec pins the property corpus-wide) and ≤ ε·N with high
    * probability per probe. The exact side is the EVALUATION, not the
    * production path: it recounts only to grade the sketch, the same
    * role the exact-Jaccard side plays in dedup_minhash_est. The sketch
    * side joins the ≤ d·w-cell table (broadcast) against the d probe
    * rows per token and takes the min.
    */
  def cmsEstimates(docs: DataFrame, d: Int = 4, w: Int = 256,
                   topN: Int = 100): DataFrame = {
    import graft.functions.TextOps
    val toks = docs
      .select(explode(TextOps.splitWords(TextOps.normalize(col("text")))).as("token"))
      .filter(length(col("token")) > 0)
    val probes = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(desc("exact_cnt"), col("token")).limit(topN)
    probes
      .select(col("token"), col("exact_cnt"),
        explode(typedLit((0 until d).toList)).as("r"))
      .withColumn("c", cmsCell(col("token"), col("r"), w))
      .join(broadcast(cmsSketch(docs, d, w)), Seq("r", "c"))
      .groupBy("token", "exact_cnt").agg(min("cnt").as("cms_est"))
      .select(col("token"), col("cms_est"), col("exact_cnt"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
  }

  /** EXACT φ-heavy hitters (all tokens with count > φ·N) via the
    * two-pass Misra–Gries discipline — the bounded-state alternative to
    * `groupBy(token)` over the full token universe, which at 100 TB
    * shuffles hundreds of millions of distinct tail tokens to find the
    * dozens that matter (boilerplate markers, stopwords, template
    * chrome).
    *
    * Pass 1: ONE aggregate over the token stream through
    * [[graft.functions.MgAgg]] (buffer ≤ k entries at every stage) plus
    * the total count — a single 1-row result, localCheckpointed because
    * both the candidate set and N are read from it. Pass 2: recount
    * ONLY candidate tokens exactly (broadcast semi-join, ≤ k keys, so
    * the recount's shuffle carries ≤ k·P partial rows), then gate on
    * count > φ·N via the 1-row cross. MG's deficiency bound (≤ N/(k+1))
    * makes the candidate set a provable superset of the φ-heavy items
    * whenever φ > 1/(k+1) (`require`d), so the output is exact — the
    * DuckDB twin is the plain HAVING-count query. Zero driver-side
    * collects; two corpus scans (the textbook two-pass trade: a 100 TB
    * corpus re-scan beats materializing its token multiset).
    */
  def heavyHitters(docs: DataFrame, phi: Double, k: Int = 128): DataFrame = {
    require(phi > 1.0 / (k + 1),
      s"phi=$phi must exceed 1/(k+1)=${1.0 / (k + 1)} for the MG superset guarantee")
    import graft.functions.TextOps
    val mgU = udaf(new graft.functions.MgAgg(k))
    val toks = docs.select(
      explode(TextOps.splitWords(TextOps.normalize(col("text")))).as("token"))
      .filter(length(col("token")) > 0)
    val sk = toks.agg(mgU(col("token")).as("cand"), count(lit(1)).as("n"))
      .localCheckpoint() // 1 row; read twice (candidates + N)
    val cand = sk.select(explode(map_keys(col("cand"))).as("token"))
    val tot = sk.select(col("n"))
    toks.join(broadcast(cand), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") > col("n") * phi)
      .select(col("token"), col("cnt"))
      .orderBy("token")
  }
}
