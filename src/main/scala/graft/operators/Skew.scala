package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation building blocks for 100 TB shapes.
  *
  * AQE's skew-join splitting handles most runtime skew, but two patterns
  * are worth first-class operators because they change the *logical* plan:
  *
  *  - `twoPhaseAgg`: aggregate by (key, salt) first, then re-aggregate by
  *    key. For low-cardinality hot keys (stop words in postings, null-ish
  *    defaults) this bounds any single reducer's input to ~1/salt of the
  *    hot key's rows. Works for any algebraic aggregate (sum/count/min/
  *    max): phase-1 partials are themselves the phase-2 inputs.
  *
  *  - `saltedJoin`: equi-join where the big side gets a random-ish salt
  *    derived from a *deterministic* hash of its row identity and the
  *    small side is replicated salt-ways (explode). Keeps hot join keys
  *    from pinning one task; replication factor = salt.
  *
  * Both are deterministic (salts come from content hashes, not rand()) so
  * results — and the DuckDB oracle gate — are reproducible.
  */
object Skew {

  /** Deterministic salt in [0, salt) from the xxhash64 of `idCols`. */
  def saltCol(salt: Int, idCols: Column*): Column =
    pmod(xxhash64(idCols: _*), lit(salt.toLong)).cast("int")

  /** Two-phase (salted) aggregation: sum-like aggregates grouped by `key`
    * with the heavy first shuffle split `salt` ways. `aggs` maps output
    * column name → (phase1 agg of input col, phase2 agg of phase1 col).
    */
  def twoPhaseSum(df: DataFrame, key: Seq[String], salt: Int,
                  sumCols: Seq[(String, Column)], idCols: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", saltCol(salt, idCols: _*))
    val p1 = salted.groupBy((key :+ "_salt").map(col): _*)
      .agg(sumCols.head._2.as(sumCols.head._1),
        sumCols.tail.map { case (n, c) => c.as(n) }: _*)
    p1.groupBy(key.map(col): _*)
      .agg(sum(sumCols.head._1).as(sumCols.head._1),
        sumCols.tail.map { case (n, _) => sum(n).as(n) }: _*)
  }

  /** Salted inner equi-join on `key`: big side salted by row identity,
    * small side replicated `salt` ways. Result rows identical to a plain
    * join; only the partitioning changes.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 bigIdCols: Seq[Column]): DataFrame = {
    val b = big.withColumn("_salt", saltCol(salt, bigIdCols: _*))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
