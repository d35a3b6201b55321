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

  /** One micro-batch of streaming NEAR-dup dedup against an accumulated
    * signature index. Returns the batch's novel docs; appends their
    * signatures to `stateDir`.
    *
    * Mechanics (the production blocked-dedup shape, incrementalized):
    * fast-tier MinHash signatures for the batch; LSH band buckets joined
    * against BOTH the persisted index's band rows and the batch's own
    * (first-arrival-wins within a batch: doc_a < doc_b); candidates
    * verify on signature agreement (fraction of equal components >=
    * `minAgree` — the MinHash estimate of Jaccard, so state holds ONLY
    * the 12×8-byte signature per doc, never shingles or text). Docs with
    * a verified prior/earlier match are dropped; survivors' signatures
    * append to the index.
    *
    * Scale posture: every join is a band-bucket equi-join; state grows
    * 96 B/doc (+ band rows derived on read — at real scale the index
    * would persist band-partitioned for pruning, as IncrementalIndex does
    * for words); a transitive chain within one batch collapses to its
    * minimum doc_id exactly like the batch `dedup_keep` rule.
    *
    * Returns (novel docs, their signatures) — the CALLER writes them,
    * output first and state second (see dedupNearIngest). The duplicate-id
    * set is localCheckpoint'ed before returning, so (a) the candidate +
    * verify subtree runs once even though both returned frames consume it,
    * and (b) neither returned plan reads stateDir at write time — the
    * state append can never race its own batch's reads.
    */
  def dedupNearLshBatch(batch: DataFrame, stateDir: String,
                        bands: Int = 6, rowsPerBand: Int = 2,
                        minAgree: Double = 0.5): (DataFrame, DataFrame) = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    val n = bands * rowsPerBand
    val sigCols = (0 until n).map(i => s"h$i")
    val sig = Dedup.minhashSignaturesFast(Dedup.shingles(batch), n)
      .localCheckpoint() // reused 4×: band rows, both verify sides, append
    val prior = {
      val dir = new java.io.File(stateDir)
      if (dir.exists() && new java.io.File(s"$stateDir/_SUCCESS").exists())
        Some(spark.read.parquet(stateDir))
      else None
    }
    def bandsOf(s: DataFrame) =
      Dedup.bandRows(s, bands, rowsPerBand, cols => xxhash64(cols: _*))
    val newBands = bandsOf(sig)
    val agree = sigCols.map(c =>
      when(col(s"a.$c") === col(s"b.$c"), 1).otherwise(0)).reduce(_ + _)
      .cast("double") / n
    // candidate (new doc b, earlier doc a) pairs: a from the index, or an
    // earlier doc of the same batch
    val priorCand = prior.map { p =>
      bandsOf(p).as("x").join(newBands.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    }
    val batchCand = newBands.as("x").join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val cand = priorCand.map(_.unionAll(batchCand)).getOrElse(batchCand).distinct()
    val aSide = prior.map(_.unionAll(sig)).getOrElse(sig)
    val dupIds = cand
      .join(aSide.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .filter(agree >= minAgree)
      .select(col("doc_b").as("doc_id")).distinct()
      .localCheckpoint() // batch-bounded id set; see Scaladoc
    (batch.join(dupIds, Seq("doc_id"), "left_anti"),
      sig.join(dupIds, Seq("doc_id"), "left_anti"))
  }

  /** Always-on streaming near-dup dedup: novel docs land in `outDir`,
    * signatures accumulate in `stateDir`. foreachBatch (not a stateful
    * operator) because the dedup state is a persistent, queryable,
    * append-only table shared with batch jobs — the same layout decision
    * as IncrementalIndex.
    *
    * Write order matters: output FIRST, state LAST. A crash between the
    * two writes re-delivers the batch with its signatures absent from
    * state, so the docs are re-emitted (at-least-once). The reverse order
    * would make a re-delivered batch match its own persisted signatures
    * and be dropped forever.
    */
  def dedupNearIngest(docs: DataFrame, stateDir: String, outDir: String,
                      bands: Int = 6, rowsPerBand: Int = 2,
                      minAgree: Double = 0.5): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val (novel, novelSig) =
            dedupNearLshBatch(batch, stateDir, bands, rowsPerBand, minAgree)
          novel.write.mode("append").parquet(outDir)
          novelSig.write.mode("append").parquet(stateDir)
        }
      }
      .start()

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
