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
    // fail loudly mid-retrain-swap: between the swap's renames `cells` and
    // `centroids` can belong to DIFFERENT generations, and appending rows
    // celled by one generation's centroids would silently degrade recall
    graft.operators.DirSwap.requireClean(indexDir, "centroids")
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
    *
    * Replay discipline: the cells layout is a plain `cell=K` append (every
    * reader — ANN queries, retrain — scans it flat), so idempotence comes
    * from a per-batch ledger marker written AFTER the append: a batch
    * re-delivered once its marker exists is skipped outright. The residual
    * window — a crash between the append's job commit and the marker
    * create — can duplicate one batch's vectors; it is the one narrow gap
    * left open here (vs the batch-keyed DocStreams/IncrementalIndex
    * layouts, where the reader aggregates committed batch dirs and no
    * window exists), and the periodic `retrainIndex` rewrite is the
    * natural place a deployment folds in a dedup if it matters.
    */
  def vectorIngest(vectors: DataFrame, indexDir: String): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val marker = new org.apache.hadoop.fs.Path(s"$indexDir/ingested/b$batchId")
          val fs = marker.getFileSystem(
            batch.sparkSession.sparkContext.hadoopConfiguration)
          if (!fs.exists(marker)) {
            ingestVectorBatch(batch, indexDir)
            fs.mkdirs(marker.getParent)
            fs.create(marker, true).close()
          }
        }
      }
      .start()

  /** The periodic batch retrain + swap the fixed-centroid discipline
    * requires: as the streamed corpus drifts away from the distribution
    * the original centroids were trained on, cells go unbalanced and
    * probe-recall decays with no recovery path. This maintenance job
    * retrains the coarse quantizer on the vectors currently IN the index,
    * re-assigns the whole corpus, and swaps cells+centroids under ONE
    * `DirSwap.swap` marker scope: both new generations are fully
    * materialized aside before either rename, and a crash anywhere in the
    * window rolls FORWARD to the complete new generation on the next
    * `DirSwap.recover` (no more persisted mixed-generation index — the
    * round-6 version swapped the two tables independently). Readers and
    * the ingest guard on `requireClean`, so a query can no longer route by
    * one generation's centroids into the other's cells.
    *
    * The trainer's actions re-read the live `cells` dir, which is only
    * renamed after both aside-writes complete.
    */
  def retrainIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                   kCells: Int = 8, iters: Int = 5): Unit = {
    val cur = spark.read.parquet(s"$indexDir/cells").select("vec_id", "e", "nrm")
    val cent = Similarity.kmeansCentroidsPrepared(cur.select("vec_id", "e"), kCells, iters)
    graft.operators.DirSwap.swap(indexDir, Seq(
      "cells" -> { out =>
        cur.join(Similarity.kmeansAssign(cur.select("vec_id", "e"), cent), "vec_id")
          .write.partitionBy("cell").parquet(out)
      },
      // centroids are a LocalRelation (the trainer collects k×dim means),
      // so this write reads nothing live
      "centroids" -> { out => cent.write.parquet(out) }))
  }
}
