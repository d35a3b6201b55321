package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the vector-index pipeline: embeddings arrive
  * continuously and fold into the persisted k-means IVF layout, so ANN
  * queries (`Similarity.knnIvfKmeansIndexed`) keep partition-pruning to
  * probed cells while the corpus grows.
  *
  * Centroids stay FIXED during ingest — the standard IVF discipline: cell
  * assignment must agree with what queries probe, so the coarse quantizer
  * only changes in a periodic batch retrain (rebuild + swap), never
  * mid-stream. Appending a cell partition is an O(batch) parquet write;
  * nothing existing is rewritten.
  */
object VectorStreams {

  /** Assign one micro-batch to the index's centroids and append to the
    * cell-partitioned layout. Pure batch function (testable directly).
    */
  def ingestVectorBatch(batch: DataFrame, indexDir: String): Unit = {
    val spark = batch.sparkSession
    val cent = spark.read.parquet(s"$indexDir/centroids")
    val p = Similarity.prepared(batch)
    p.join(Similarity.kmeansAssign(p.select("vec_id", "e"), cent), "vec_id")
      .write.mode("append").partitionBy("cell").parquet(s"$indexDir/cells")
  }

  /** Always-on embedding ingest: readStream of (vec_id, embedding) →
    * foreachBatch append into the IVF index built by
    * `Similarity.buildKmeansIvfIndex`. foreachBatch (not a stateful
    * operator) because the index is a persistent queryable table shared
    * with batch queries — same layout decision as IncrementalIndex and
    * the near-dup signature store.
    */
  def vectorIngest(vectors: DataFrame, indexDir: String): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) ingestVectorBatch(batch, indexDir)
      }
      .start()
}
