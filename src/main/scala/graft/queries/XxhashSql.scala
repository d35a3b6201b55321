package graft.queries

/** DuckDB twin of Spark's `xxhash64` — the generator that lets the
  * xxhash64 ("fast") dedup tier carry a full hash-gated oracle instead
  * of a rows-only check (round 11; previously "no cross-engine digest"
  * was the reason the fast tier sat outside the gate).
  *
  * Spark's XxHash64 (catalyst XXH64, seed 42) chains per-field hashes:
  * an INT field applies hashInt, a LONG field hashLong, a STRING field
  * the full streaming XXH64 over its UTF-8 bytes, each seeded with the
  * running hash. All three are pure 64-bit wrapping arithmetic, which
  * DuckDB can replay exactly with two tricks:
  *
  *  - **mod-2⁶⁴ multiply without 128-bit overflow**: HUGEINT is a
  *    SIGNED int128, so a full 64×64 product overflows it. Split the
  *    variable operand: a·b ≡ (a mod 2³²)·b + ((⌊a/2³²⌋·b) mod 2³²)·2³²
  *    (mod 2⁶⁴) — every intermediate stays < 2⁹⁷.
  *  - **staged CTEs, not lateral aliases**: DuckDB expands lateral
  *    column references textually, so a chained alias pipeline blows up
  *    exponentially in the binder (measured: a 20 KB chain hung it).
  *    Each stage is a real projection — referenced columns bind once.
  *
  * Sequential folds (the 32-byte stripe loop, the 8-byte word loop, the
  * tail bytes) use `list_reduce` with the seed `list_prepend`ed; lambda
  * bodies are fixed-size text because `acc`/`x` are names, not inlined
  * expressions. Byte access goes through `hex(encode(s))` + substr
  * (little-endian words = byte pairs concatenated in reverse).
  *
  * Validated three ways before integration: a Python reference matched
  * Spark's `xxhash64` on strings of every length regime (0, <8, =8,
  * <32, =32, >32, multi-stripe, 100B), int→string chains, and 4-long
  * chains; this SQL matches the reference bit-for-bit on the same
  * corpus of cases; and the integrated oracle hash-gates
  * `dedup_minhash_fast` end to end at both SFs.
  */
object XxhashSql {

  private val M64 = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  private def mul(a: String, b: String): String = {
    val ah = s"(CAST($a AS HUGEINT) // 4294967296)"
    val al = s"(CAST($a AS HUGEINT) % 4294967296)"
    s"CAST(($al * $b + (($ah * $b) % 4294967296) * 4294967296) % $M64 AS UBIGINT)"
  }
  private def add(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + $b) % $M64 AS UBIGINT)"
  private def xr(a: String, b: String): String = s"xor($a, $b)"
  private def shr(a: String, r: Int): String =
    s"CAST(CAST($a AS HUGEINT) // ${1L << r} AS UBIGINT)"
  private def rotl(a: String, r: Int): String =
    s"CAST(((CAST($a AS HUGEINT) * ${1L << r}) % $M64 + " +
      s"CAST($a AS HUGEINT) // ${1L << (64 - r)}) AS UBIGINT)"
  /** rotl31(v·P2)·P1 — the shared "round" kernel. */
  private def round0(v: String): String = mul(rotl(mul(v, P2), 31), P1)

  /** Little-endian 8-byte word `jexpr` (0-based) of the hex column hx. */
  private def wordExpr(jexpr: String): String = {
    val parts = Seq(7, 6, 5, 4, 3, 2, 1, 0)
      .map(k => s"substr(hx, CAST(16*($jexpr)+${2 * k + 1} AS INT), 2)").mkString(", ")
    s"CAST(CONCAT('0x', $parts) AS UBIGINT)"
  }
  /** Little-endian 4-byte word at the first unconsumed-by-words offset. */
  private def dwordExpr: String = {
    val parts = Seq(3, 2, 1, 0)
      .map(k => s"substr(hx, CAST(16*(ln//8)+${2 * k + 1} AS INT), 2)").mkString(", ")
    s"CAST(CONCAT('0x', $parts) AS UBIGINT)"
  }

  /** Java's XXH64.hashInt — for precomputing chained-seed constants
    * driver-side (e.g. xxhash64(lit(i), str) ≡ string hash seeded with
    * hashInt(i, 42), a per-i constant).
    */
  def hashInt(i: Int, seed: Long): Long = {
    val PRIME1 = -7046029288634856825L; val PRIME2 = -4417276706812531889L
    val PRIME3 = 1609587929392839161L; val PRIME5 = 2870177450012600261L
    var h = seed + PRIME5 + 4L
    h ^= (i & 0xFFFFFFFFL) * PRIME1
    h = java.lang.Long.rotateLeft(h, 23) * PRIME2 + PRIME3
    fmixL(h)
  }
  private def fmixL(h0: Long): Long = {
    val PRIME2 = -4417276706812531889L; val PRIME3 = 1609587929392839161L
    var h = h0
    h ^= h >>> 33; h *= PRIME2; h ^= h >>> 29; h *= PRIME3; h ^= h >>> 32
    h
  }

  /** Staged-CTE chain computing `xh` = signed xxhash64 of a string's
    * UTF-8 bytes with a per-row seed. `src` must provide `hx`
    * (hex(encode(s))), `ln` (octet_length), `useed` (seed mod 2⁶⁴ as
    * UBIGINT), plus `carry` columns to thread through. Emits CTEs
    * `{p}b1..{p}b9`; read `xh` from `{p}b9`.
    */
  def strChainCtes(p: String, src: String, carry: Seq[String]): String = {
    val c = (carry ++ Seq("ln", "useed")).mkString(", ")
    def blk(k: Int) = mul(rotl(add(s"acc[$k]", mul(s"x[$k]", P2)), 31), P1)
    // v1..v4 accumulator seeds; v4 = seed − P1 ≡ seed + (2⁶⁴ − P1)
    val init = s"[${add("useed", s"$P1 + $P2")}, ${add("useed", P2)}, useed, " +
      s"${add("useed", "7046029288634856825")}]"
    val blocks = "list_transform(range(0, CAST(ln // 32 AS BIGINT)), bi -> [" +
      "words[CAST(4*bi+1 AS INT)], words[CAST(4*bi+2 AS INT)], " +
      "words[CAST(4*bi+3 AS INT)], words[CAST(4*bi+4 AS INT)]])"
    val hv = add(add(add(rotl("vl[1]", 1), rotl("vl[2]", 7)), rotl("vl[3]", 12)), rotl("vl[4]", 18))
    val merge = add(mul(xr("acc", round0("x")), P1), P4)
    val step8 = add(mul(rotl(xr("acc", round0("x")), 27), P1), P4)
    val h4s = add(mul(rotl(xr("h8", mul("dw", P1)), 23), P2), P3)
    val stepb = mul(rotl(xr("acc", mul("x", P5)), 11), P1)
    val tstart = "(ln // 8) * 8 + CASE WHEN ln % 8 >= 4 THEN 4 ELSE 0 END"
    val tb = s"list_transform(range($tstart, ln), k -> " +
      "CAST(CONCAT('0x', substr(hx, CAST(2*k+1 AS INT), 2)) AS UBIGINT))"
    s"""${p}b1 AS (SELECT $c, list_transform(range(0, ln // 8), j -> ${wordExpr("j")}) AS words,
       |    CASE WHEN ln % 8 >= 4 THEN $dwordExpr ELSE CAST(0 AS UBIGINT) END AS dw, $tb AS tailb FROM $src),
       |${p}b2 AS (SELECT $c, words, dw, tailb,
       |    CASE WHEN ln >= 32 THEN list_reduce(list_prepend($init, $blocks), (acc, x) -> [${blk(1)}, ${blk(2)}, ${blk(3)}, ${blk(4)}]) ELSE NULL END AS vl FROM ${p}b1),
       |${p}b3 AS (SELECT $c, words, dw, tailb,
       |    CASE WHEN vl IS NOT NULL THEN list_reduce(list_prepend($hv, vl), (acc, x) -> $merge) ELSE ${add("useed", P5)} END AS hb FROM ${p}b2),
       |${p}b4 AS (SELECT $c, words, dw, tailb, ${add("hb", "CAST(ln AS HUGEINT)")} AS hl FROM ${p}b3),
       |${p}b5 AS (SELECT $c, dw, tailb,
       |    list_reduce(list_prepend(hl, words[CAST(4*(ln//32)+1 AS INT):CAST(len(words) AS INT)]), (acc, x) -> $step8) AS h8 FROM ${p}b4),
       |${p}b6 AS (SELECT $c, tailb, CASE WHEN ln % 8 >= 4 THEN $h4s ELSE h8 END AS h4 FROM ${p}b5),
       |${p}b7 AS (SELECT $c, list_reduce(list_prepend(h4, tailb), (acc, x) -> $stepb) AS ht FROM ${p}b6),
       |${p}b8 AS (SELECT $c, ${xr("ht", shr("ht", 33))} AS f1 FROM ${p}b7),
       |${p}b8a AS (SELECT $c, ${mul("f1", P2)} AS f2 FROM ${p}b8),
       |${p}b8b AS (SELECT $c, ${xr("f2", shr("f2", 29))} AS f3 FROM ${p}b8a),
       |${p}b8c AS (SELECT $c, ${mul("f3", P3)} AS f4 FROM ${p}b8b),
       |${p}b8d AS (SELECT $c, ${xr("f4", shr("f4", 32))} AS f5 FROM ${p}b8c),
       |${p}b9 AS (SELECT $c, CAST(CAST(f5 AS HUGEINT) - CASE WHEN f5 >= 9223372036854775808 THEN $M64 ELSE 0 END AS BIGINT) AS xh FROM ${p}b8d)""".stripMargin
  }

  /** Staged-CTE chain computing `outName` = signed xxhash64 of the
    * signed-BIGINT columns `cols` chained in order from seed 42 (the
    * band-hash shape: full hashLong — round, mix, avalanche — per
    * field). Emits `{p}l..` stages; read `outName` from `{p}out`.
    */
  def longChainCtes(p: String, src: String, carry: Seq[String],
                    cols: Seq[String], outName: String): String = {
    val c = carry.mkString(", ")
    val lines = Seq.newBuilder[String]
    var prev = src
    var acc = "CAST(42 AS UBIGINT)"
    cols.zipWithIndex.foreach { case (colName, k) =>
      val u = s"CAST((CAST($colName AS HUGEINT) + $M64) % $M64 AS UBIGINT)"
      def rest(from: Int, extra: String) = (cols.drop(from) :+ extra).mkString(", ")
      lines += s"${p}l${k}a AS (SELECT $c, ${rest(k, add(acc, s"$P5 + 8") + " AS t1")} FROM $prev)"
      lines += s"${p}l${k}b AS (SELECT $c, ${rest(k, xr("t1", round0(u)) + " AS t2")} FROM ${p}l${k}a)"
      lines += s"${p}l${k}c AS (SELECT $c, ${rest(k + 1, add(mul(rotl("t2", 27), P1), P4) + " AS t3")} FROM ${p}l${k}b)"
      lines += s"${p}l${k}d AS (SELECT $c, ${rest(k + 1, xr("t3", shr("t3", 33)) + " AS g1")} FROM ${p}l${k}c)"
      lines += s"${p}l${k}e AS (SELECT $c, ${rest(k + 1, mul("g1", P2) + " AS g2")} FROM ${p}l${k}d)"
      lines += s"${p}l${k}f AS (SELECT $c, ${rest(k + 1, xr("g2", shr("g2", 29)) + " AS g3")} FROM ${p}l${k}e)"
      lines += s"${p}l${k}g AS (SELECT $c, ${rest(k + 1, mul("g3", P3) + " AS g4")} FROM ${p}l${k}f)"
      lines += s"${p}l${k}h AS (SELECT $c, ${rest(k + 1, xr("g4", shr("g4", 32)) + s" AS acc$k")} FROM ${p}l${k}g)"
      prev = s"${p}l${k}h"
      acc = s"acc$k"
    }
    lines += s"${p}out AS (SELECT $c, CAST(CAST($acc AS HUGEINT) - " +
      s"CASE WHEN $acc >= 9223372036854775808 THEN $M64 ELSE 0 END AS BIGINT) AS $outName FROM $prev)"
    lines.result().mkString(",\n")
  }
}
