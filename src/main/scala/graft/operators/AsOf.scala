package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.DataFrame

/** Distributed backward as-of join — an operator Spark SQL lacks natively.
  *
  * For each left row, find the right row with the greatest `ts <= left.ts`
  * within the same `key` group (DuckDB/`pandas.merge_asof` "backward"
  * semantics, left-outer).
  *
  * Implementation is the union-and-carry-forward pattern rather than a
  * range join: tag both sides, union, and take `last(right_payload,
  * ignoreNulls)` over a window ordered by (ts, side, tie-break) with
  * unbounded-preceding→current frame. Right rows sort before left rows at
  * equal ts, so an exactly-simultaneous right row matches.
  *
  * Scale posture: exactly ONE shuffle (hash partition by key) and a
  * per-key sort — linear in |L|+|R|, no join blow-up, no range-condition
  * nested loop. This is how streaming engines implement temporal joins;
  * at 100 TB the only care is key skew (salt hot keys or range-partition
  * by (key, ts) buckets).
  */
object AsOf {

  /** Backward as-of join. `left`/`right` must both carry `key` and `ts`
    * columns. Returns all left columns plus a nullable `_asof` struct of
    * the matched right row (null when no right row precedes). `tieBreak`
    * names a right column ordering simultaneous right rows (last wins).
    */
  def joinBackward(left: DataFrame, right: DataFrame,
                   key: String, ts: String, tieBreak: String): DataFrame = {
    val lCols = struct(left.columns.map(col): _*)
    val rCols = struct(right.columns.map(col): _*)
    val lp = left.select(col(key).as("_k"), col(ts).as("_t"),
      lit(1).as("_side"), lCols.as("_l"),
      lit(null).cast(StructType(right.schema)).as("_r"))
    val rp = right.select(col(key).as("_k"), col(ts).as("_t"),
      lit(0).as("_side"), lit(null).cast(StructType(left.schema)).as("_l"),
      rCols.as("_r"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_r").getField(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lp.unionByName(rp)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*"), col("_asof"))
  }
}
