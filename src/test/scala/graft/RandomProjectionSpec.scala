package graft

import graft.operators.{RandomProjection, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JL-lemma semantics for the random projection: distance ratios
  * concentrate near 1, the matrix is the deterministic md5-parity one,
  * and the projection plan is row-local.
  */
class RandomProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def prep = Similarity.prepared(
    graft.sources.Tables.embeddings(spark, TestSpark.sf0001)).select("vec_id", "e")

  test("pairwise distance ratios concentrate around 1 (JL at k=16)") {
    val d = RandomProjection.distortion(prep, 16, 32)
      .agg(min("ratio").as("mn"), max("ratio").as("mx"), avg("ratio").as("av"),
        count(lit(1)).as("n")).collect()(0)
    assert(d.getLong(3) == 32L * 31 / 2)
    // measured at sf0.01: [0.52, 1.50], mean 1.02 — k=16 from d=64 gives
    // ε ≈ 0.5 tails; the claims below are the honest envelope
    assert(d.getDouble(2) > 0.8 && d.getDouble(2) < 1.2,
      s"mean ratio ${d.getDouble(2)} — unbiasedness broke")
    assert(d.getDouble(0) > 0.3 && d.getDouble(1) < 1.9,
      s"ratio envelope [${d.getDouble(0)}, ${d.getDouble(1)}]")
  }

  test("projection halves of a duplicated vector are identical (determinism)") {
    import spark.implicits._
    val twice = Seq(
      (1L, Seq.tabulate(64)(i => (i * 0.01f - 0.3f))),
      (2L, Seq.tabulate(64)(i => (i * 0.01f - 0.3f)))
    ).toDF("vec_id", "embedding")
    val p = Similarity.prepared(twice).select("vec_id", "e")
    val rows = RandomProjection.project(p, 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val a = rows.filter(_._1 == 1L).map(t => (t._2, t._3)).toMap
    val b = rows.filter(_._1 == 2L).map(t => (t._2, t._3)).toMap
    assert(a == b)
    assert(a.size == 16)
  }

  test("plan shape: projection is row-local against literal planes") {
    val s = RandomProjection.project(prep, 16).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!s.contains("Join"), "RP must not join — 16 planes ride as literals")
    assert(!s.contains("Exchange"))
    assert(!s.contains("ScalaUDF"))
  }
}
