package graft

import graft.operators.{Quantize, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantization-theory checks for the SQ8 tier: code range, the
  * half-step error bound, constant-dimension degeneracy, serving recall
  * against the exact brute tier, and the row-local plan shape.
  */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def prep = Similarity.prepared(
    graft.sources.Tables.embeddings(spark, TestSpark.sf0001)).select("vec_id", "e")

  test("codes are bytes, bounds are ordered, roundtrip error obeys the half-step bound") {
    val p = prep
    val (lo, hi) = Quantize.bounds(p)
    assert(lo.zip(hi).forall { case (l, h) => l <= h })
    val c = Quantize.codes(p, lo, hi)
      .agg(min("code").as("mn"), max("code").as("mx")).collect()(0)
    assert(c.getInt(0) >= 0 && c.getInt(1) <= 255)
    // per-element |x − x̂| ≤ step/2 ⇒ L2 ≤ √(Σ (stepᵢ/2)²) (+ stab slack)
    val bound = math.sqrt(lo.indices.map { i =>
      val s = (hi(i) - lo(i)) / 255.0 / 2.0; s * s
    }.sum) + 1e-5
    val worst = Quantize.reconError(p, lo, hi).agg(max("l2_err")).collect()(0).getDouble(0)
    assert(worst <= bound, s"l2 $worst > theoretical bound $bound")
    // cosine of a 64-dim vector against its 8-bit self stays ≈ 1
    val minCos = Quantize.reconError(p, lo, hi).agg(min("cos")).collect()(0).getDouble(0)
    assert(minCos > 0.999, s"recon cosine $minCos")
  }

  test("constant dimension codes to 0 and dequantizes to lo, no NaN anywhere") {
    import spark.implicits._
    val fixed = (0L until 20L).map(i =>
      (i, Seq(1.5f, (i % 7).toFloat, -2.0f))).toDF("vec_id", "embedding")
    val p = Similarity.prepared(fixed).select("vec_id", "e")
    val (lo, hi) = Quantize.bounds(p)
    assert(lo(0) == 1.5 && hi(0) == 1.5 && lo(2) == -2.0 && hi(2) == -2.0)
    val codes = Quantize.codes(p, lo, hi).filter(col("i") === 1 || col("i") === 3)
      .filter(col("code") =!= 0).count()
    assert(codes == 0L)
    val nans = Quantize.reconError(p, lo, hi)
      .filter(isnan(col("l2_err")) || isnan(col("cos"))).count()
    assert(nans == 0L)
  }

  test("SQ8 serving recall vs the exact brute tier") {
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf0001)
    val exact = Similarity.bruteForceTopK(emb, 10, 5)
      .select("query_id", "neighbor_id")
    val sq = Quantize.knnSq8(emb, 10, 5).select("query_id", "neighbor_id")
    val rec = Similarity.annRecall(exact, sq)
      .agg(avg("recall")).collect()(0).getDouble(0)
    // 8 bits at d=64 is ranking-lossless on this corpus (measured 1.0
    // at sf0.01); 0.9 is the honest floor for the claim "SQ8 serves"
    assert(rec >= 0.9, s"SQ8 recall $rec")
  }

  test("plan shape: codes and error are row-local against literal bounds") {
    val p = prep
    val (lo, hi) = Quantize.bounds(p)
    for (df <- Seq(Quantize.codes(p, lo, hi), Quantize.reconError(p, lo, hi))) {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!s.contains("Join"), "quantization must not join — bounds are literals")
      assert(!s.contains("Exchange"), "quantization must not shuffle")
      assert(!s.contains("ScalaUDF"))
    }
  }
}
