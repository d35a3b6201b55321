package graft.streaming

import graft.operators.IncrementalIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twins of the document-pipeline operators — the shapes an
  * always-on ingest for a training corpus needs.
  */
object DocStreams {

  /** Streaming exact dedup: drop any document whose content digest was
    * already seen, keeping the first arrival (the streaming twin of
    * Dedup.exact's keep-the-minimum rule under arrival order).
    *
    * State discipline for an unbounded corpus: the digest store can't grow
    * forever, so dedup state is scoped by the event-time watermark
    * (`dropDuplicatesWithinWatermark`) — a duplicate arriving within
    * `horizon` of the original is dropped, state older than the watermark
    * is evicted. A 100 TB/day ingest pairs this bounded-horizon pass with
    * the periodic batch `dedup_keep` job for full-history dedup; md5 state
    * is 16 bytes/doc either way, never the payload.
    */
  def dedupExact(docs: DataFrame, horizon: String = "10 minutes"): DataFrame =
    docs.withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("text_hash")

  /** The always-on corpus pipeline in one query: stream in → dedup →
    * fold into the incremental search index (foreachBatch over
    * IncrementalIndex.ingestBatch). Duplicates never reach the index, so
    * df counts stay correct without any read-modify-write; the index is
    * queryable concurrently (append-only layout). Dedup emits first
    * arrivals immediately — indexing latency is one micro-batch, not one
    * watermark horizon.
    */
  def dedupIngest(docs: DataFrame, indexDir: String,
                  horizon: String = "10 minutes"): StreamingQuery =
    dedupExact(docs, horizon).writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) IncrementalIndex.ingestBatch(batch.drop("text_hash"), indexDir)
      }
      .start()
}
