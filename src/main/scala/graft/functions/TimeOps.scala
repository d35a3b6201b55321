package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timestamp arithmetic helpers shared by the event operators. */
object TimeOps {

  /** Epoch milliseconds of a timestamp column, tolerant of TIMESTAMP_NTZ.
    *
    * Parquet written without `isAdjustedToUTC` (DuckDB's plain TIMESTAMP,
    * pandas naive datetimes) reads back as TIMESTAMP_NTZ, and Spark's
    * `unix_millis` rejects that type with DATATYPE_MISMATCH. Every session
    * in this repo pins `spark.sql.session.timeZone=UTC`, so the
    * NTZ→TIMESTAMP cast reinterprets the naive value as UTC — exactly the
    * epoch DuckDB's `epoch_ms` assigns the same naive value. On a column
    * that is already TIMESTAMP the cast is a no-op.
    */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))
}
