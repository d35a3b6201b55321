package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Streaming KMV gate: the stream's running sketch must be value-
  * IDENTICAL (n_kept, threshold element string, stab(6) estimate) to the
  * batch `Sketch.kmvDistinct` over the same rows — at every prefix, not
  * just the end. The batch tier is DuckDB-hash-gated (q_kmv_distinct),
  * so this transitively pins the streaming fold to the oracle.
  */
class SketchStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def batchSketch(rows: Seq[(String, Long)], k: Int): Map[String, (Long, String, Double)] = {
    import spark.implicits._
    graft.operators.Sketch.kmvDistinct(rows.toDF("grp", "key"), "grp", col("key"), k)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap
  }

  test("streaming KMV equals the batch sketch at every prefix") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val k = 64
    val all = graft.sources.Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("l_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val chunks = all.grouped((all.size + 2) / 3).toSeq
    assert(chunks.size == 3)

    val latest = scala.collection.concurrent.TrieMap.empty[String, (Long, String, Double)]
    val mem = MemoryStream[(String, Long)]
    val ds = graft.streaming.SketchStreams.kmvStream(
      mem.toDF.toDF("grp", "key"), "grp", "key", k)
    val q = ds.writeStream.outputMode("update")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.SketchStreams.KmvUpdate], _: Long) =>
          b.collect().foreach(u =>
            latest(u.grp) = ((u.n_kept, u.kth_uh, u.est_distinct)))
      }.start()
    try {
      var fed = Seq.empty[(String, Long)]
      for (chunk <- chunks) {
        mem.addData(chunk: _*)
        q.processAllAvailable()
        fed = fed ++ chunk
        val want = batchSketch(fed, k)
        assert(latest.toMap == want,
          s"stream state diverged from batch sketch after ${fed.size} rows")
      }
    } finally q.stop()
    // the final sketches are full (the fixture has > k distinct keys/group)
    assert(latest.values.forall(_._1 == k.toLong))
  }

  test("sketch merge is exact set algebra: fold of k-min sets == k-min of union") {
    // property at the state level, no stream needed: folding any partition
    // of the hash stream through foldState gives the same k-min set as
    // one pass — the KMV mergeability theorem the streaming tier rides
    val hashes = (1 to 500).map(i => graft.queries.XxhashSql.hashInt(i, 42L))
    val k = 16
    val onePass = graft.streaming.SketchStreams.foldState(Array.empty, hashes.iterator, k)
    for (splitAt <- Seq(1, 100, 250, 499)) {
      val (a, b) = hashes.splitAt(splitAt)
      val folded = graft.streaming.SketchStreams.foldState(
        graft.streaming.SketchStreams.foldState(Array.empty, a.iterator, k),
        b.iterator, k)
      assert(folded.toSeq == onePass.toSeq, s"split at $splitAt diverged")
    }
  }

  test("streaming Misra-Gries equals the sequential fold at every prefix, " +
    "and keeps the heavy-hitter superset") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val k = 8
    // zipf-ish token stream over two groups, sequenced for a total order
    val all = graft.sources.ZipfCorpus.synth(
        spark.range(60L).selectExpr("id AS doc_id"))
      .selectExpr("CAST(doc_id % 2 AS STRING) AS grp",
        "explode(split(text, ' ')) AS item")
      .selectExpr("grp", "item").collect()
      .zipWithIndex.map { case (r, i) => (r.getString(0), r.getString(1), i.toLong) }.toSeq
    val chunks = all.grouped((all.size + 2) / 3).toSeq
    // reference: the batch MgAgg folded sequentially in seq order
    def refFold(rows: Seq[(String, String, Long)]): Map[String, Map[String, Long]] = {
      val agg = new graft.functions.MgAgg(k)
      rows.sortBy(_._3).groupBy(_._1).view
        .mapValues(_.sortBy(_._3).foldLeft(Map.empty[String, Long])(
          (m, t) => agg.reduce(m, t._2))).toMap
    }
    val latest = scala.collection.concurrent.TrieMap.empty[String, (Long, Map[String, Long])]
    val mem = MemoryStream[(String, String, Long)]
    val ds = graft.streaming.SketchStreams.mgStream(
      mem.toDF.toDF("grp", "item", "seq"), "grp", "item", "seq", k)
    val q = ds.writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.SketchStreams.MgRow], _: Long) =>
          b.collect().groupBy(_.grp).foreach { case (g, rows) =>
            latest(g) = ((rows.head.n_total, rows.map(r => r.item -> r.cnt).toMap))
          }
      }.start()
    try {
      var fed = Seq.empty[(String, String, Long)]
      for (chunk <- chunks) {
        mem.addData(chunk: _*)
        q.processAllAvailable()
        fed = fed ++ chunk
        val want = refFold(fed)
        assert(latest.view.mapValues(_._2).toMap == want,
          s"stream MG state diverged from the sequential fold after ${fed.size} rows")
        // order-independent guarantee: every item with true count
        // > n/(k+1) is in the summary (the exact-recount pass relies on it)
        fed.groupBy(_._1).foreach { case (g, rows) =>
          val n = rows.size
          val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong)
          val heavy = truth.filter(_._2 > n.toLong / (k + 1)).keySet
          assert(heavy.subsetOf(latest(g)._2.keySet),
            s"group $g lost a heavy hitter: ${heavy -- latest(g)._2.keySet}")
        }
      }
      // state really is bounded
      assert(latest.values.forall(_._2.size <= k))
    } finally q.stop()
  }

  test("streaming CMS ledger-sum equals the batch sketch at every prefix; " +
    "crash-replay of a committed batch is a state no-op") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val (d, w) = (4, 32)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-cms-state").toString
    val all = graft.sources.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val chunks = all.grouped((all.size + 2) / 3).toSeq
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.SketchStreams.cmsIngest(
      mem.toDF.toDF("doc_id", "text"), stateDir, d, w)
    try {
      var fed = Seq.empty[(Long, String)]
      for (chunk <- chunks) {
        mem.addData(chunk: _*)
        q.processAllAvailable()
        fed = fed ++ chunk
        val want = cells(graft.operators.Sketch.cmsSketch(
          fed.toDF("doc_id", "text"), d, w))
        val got = cells(graft.streaming.SketchStreams.cmsState(spark, stateDir))
        assert(got == want,
          s"CMS ledger diverged from the batch sketch after ${fed.size} docs")
      }
    } finally q.stop()
    val before = cells(graft.streaming.SketchStreams.cmsState(spark, stateDir))
    // crash-replay: a NEW query (fresh checkpoint ⇒ batch ids restart at
    // 0) re-feeds chunk 1 — writeBatch sees batch=0 already committed and
    // leaves it untouched, so the live sketch is unchanged
    val mem2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.SketchStreams.cmsIngest(
      mem2.toDF.toDF("doc_id", "text"), stateDir, d, w)
    try {
      mem2.addData(chunks.head: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val after = cells(graft.streaming.SketchStreams.cmsState(spark, stateDir))
    assert(after == before, "replayed batch mutated the CMS ledger")
  }
}
