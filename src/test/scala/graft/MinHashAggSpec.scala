package graft

import graft.functions.MinHashAgg
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass Aggregator must produce the exact signature the
  * 12-expression-column formulation produces (same md5, same slices).
  */
class MinHashAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("MinHashAgg == minhashSignatures, value for value") {
    val sh = Dedup.shingles(Tables.documents(spark, TestSpark.sf0001), 3)
    val viaColumns = Dedup.minhashSignatures(sh, 12)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong).toSeq).toMap
    val udaf = org.apache.spark.sql.functions.udaf(new MinHashAgg(12))
    val viaAgg = sh.groupBy("doc_id").agg(udaf(col("shingle")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaAgg.keySet == viaColumns.keySet)
    viaAgg.foreach { case (doc, sig) =>
      assert(sig == viaColumns(doc), s"doc $doc signature mismatch")
    }
  }
}
