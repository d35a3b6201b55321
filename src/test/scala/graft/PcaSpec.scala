package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Eigen-semantics and plan-shape checks for the PCA pipeline. The gate
  * (emb_pca_cov / emb_pca_var / emb_pca_project vs their unrolled DuckDB
  * twins) proves cross-engine determinism; THIS spec proves the numbers
  * mean what PCA claims: dominant directions recovered, eigenpairs
  * consistent, projection variance = eigenvalue.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val D = 8

  /** Planted two-direction fixture: x(i) = s1(i)·u + s2(i)·w with u ⟂ w
    * non-axis-aligned unit vectors and var(s1) ≫ var(s2) — the sample
    * covariance's top eigenvectors are (up to the s1·s2 sample cross
    * term) u then w.
    */
  private lazy val planted = {
    import spark.implicits._
    val u = Array(0.6, 0.8, 0, 0, 0, 0, 0, 0)
    val w = Array(-0.8, 0.6, 0, 0, 0, 0, 0, 0)
    val rows = (0 until 200).map { i =>
      val s1 = (i % 20).toDouble - 9.5         // var ≈ 33.25
      val s2 = ((i * 7) % 11).toDouble - 5.0   // var ≈ 10, scaled below
      val x = Array.tabulate(D)(k => s1 * u(k) + 0.3 * s2 * w(k))
      (i.toLong, x.map(_.toFloat).toSeq)
    }
    (rows.toDF("vec_id", "embedding"), u, w)
  }

  private def prep(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"),
      graft.operators.Similarity.toDouble(col("embedding")).as("e"))

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))

  test("planted dominant directions are recovered, eigenpairs consistent") {
    val (df, u, w) = planted
    val p = prep(df)
    val mu = Pca.meanVector(p)
    val covRows = Pca.covariance(p, mu)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val comps = Pca.powerComponents(covRows, D, k = 2, iters = 32)
    val Seq(c1, c2) = comps
    // direction recovery (sign-free) and unit norms
    assert(math.abs(dot(c1.v, u)) > 0.99, s"PC1 missed the planted direction")
    assert(math.abs(dot(c2.v, w)) > 0.99, s"PC2 missed the planted direction")
    assert(math.abs(nrm(c1.v) - 1.0) < 1e-4)
    assert(math.abs(nrm(c2.v) - 1.0) < 1e-4)
    assert(math.abs(dot(c1.v, c2.v)) < 1e-2, "components not orthogonal")
    assert(c1.lambda >= c2.lambda && c2.lambda >= 0.0)
    // eigen residual ‖C·v1 − λ1·v1‖∞ on the converged fixture
    val c = Array.ofDim[Double](D, D)
    covRows.foreach { case (i, j, v) => c(i - 1)(j - 1) = v }
    val res = (0 until D).map { i =>
      math.abs((0 until D).map(j => c(i)(j) * c1.v(j)).sum - c1.lambda * c1.v(i))
    }.max
    assert(res < 1e-3, s"eigen residual $res")
    // explained variance: trace ≥ λ1 + λ2, fractions in (0, 1]
    val prof = Pca.varianceProfile(covRows, comps)
    val fracs = prof.map(_._3)
    assert(fracs.forall(f => f > 0.0 && f <= 1.0))
    assert(fracs.sum <= 1.0 + 1e-6)
    // the planted fixture concentrates essentially ALL variance in 2 dims
    assert(fracs.sum > 0.999, s"two components explain ${fracs.sum}")
  }

  test("projection variance equals the eigenvalue") {
    val (df, _, _) = planted
    val p = prep(df)
    val (mu, comps) = Pca.fit(p, k = 2, iters = 32)
    val pc = Pca.project(p, mu, comps)
      .agg(variance(col("pc1")).as("v1"), variance(col("pc2")).as("v2"),
        avg(col("pc1")).as("m1"), count(lit(1)).as("n"))
      .collect()(0)
    val n = pc.getLong(3).toDouble
    // Pca.covariance is population (/n); Spark variance is sample (/n−1)
    val v1pop = pc.getDouble(0) * (n - 1) / n
    val v2pop = pc.getDouble(1) * (n - 1) / n
    assert(math.abs(v1pop - comps(0).lambda) / comps(0).lambda < 1e-3,
      s"var(pc1)=$v1pop vs λ1=${comps(0).lambda}")
    assert(math.abs(v2pop - comps(1).lambda) / comps(1).lambda < 1e-2,
      s"var(pc2)=$v2pop vs λ2=${comps(1).lambda}")
    // centered projection: mean ≈ 0
    assert(math.abs(pc.getDouble(2)) < 1e-4)
  }

  test("whiten: unit population variance per component on the planted fixture") {
    val (df, _, _) = planted
    val p = prep(df)
    val (mu, comps) = Pca.fit(p, k = 2, iters = 32)
    val r = Pca.whiten(p, mu, comps)
      .agg(variance(col("w1")).as("v1"), variance(col("w2")).as("v2"),
        count(lit(1)).as("n")).collect()(0)
    val n = r.getLong(2).toDouble
    assert(math.abs(r.getDouble(0) * (n - 1) / n - 1.0) < 1e-3,
      s"whitened var ${r.getDouble(0) * (n - 1) / n}")
    assert(math.abs(r.getDouble(1) * (n - 1) / n - 1.0) < 1e-2)
  }

  test("real embeddings: eigenvalue ordering and sane fractions at sf0.001") {
    val p = prep(graft.sources.Tables.embeddings(spark, TestSpark.sf0001))
    val mu = p.select(posexplode(col("e"))).groupBy("pos").count().count()
    assert(mu == 64)
    val (_, comps) = Pca.fit(p, k = 2, iters = 32)
    assert(comps(0).lambda >= comps(1).lambda && comps(1).lambda > 0.0)
    assert(math.abs(nrm(comps(0).v) - 1.0) < 1e-4)
  }

  test("OuterProductFlat matches the higher-order-function spelling bit-for-bit") {
    import org.apache.spark.sql.graftglue
    val p = prep(graft.sources.Tables.embeddings(spark, TestSpark.sf0001)).limit(50)
    val native = graftglue.column(graft.functions.OuterProductFlat(
      graftglue.expression(col("e"))))
    val hof = flatten(transform(col("e"), x => transform(col("e"), y => x * y)))
    val bad = p.select(col("vec_id"), native.as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0L)
  }

  test("plan shape: covariance is one exchange, join-free, codegen kernel; projection is shuffle-free") {
    val p = prep(graft.sources.Tables.embeddings(spark, TestSpark.sf0001))
    val mu = Pca.meanVector(p)
    val cov = Pca.covariance(p, mu)
    val cp = cov.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!cp.contains("Join"), "covariance must be a single-pass aggregate")
    assert(!cp.contains("ScalaUDF"), "covariance kernel left codegen")
    assert("\\) Exchange".r.findAllIn(cp).size == 1,
      "covariance needs exactly the one-buffer aggregate exchange")
    // round-18 kernel: the buffer-vectorized OuterFixSumAgg (one flat
    // long-array buffer per task) replaced the posexplode +
    // outer_product_flat + d²-keyed hash aggregate — same quantized
    // arithmetic (PcaSpec values unchanged), ~5× the covariance pass
    assert(cp.toLowerCase.contains("outerfixsumagg"), "buffer kernel not in the plan")
    assert(!cp.contains("outer_product_flat"),
      "the d²-row explode kernel is retired (round-18 optimization)")
    val comps = Pca.powerComponents(
      cov.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))), 64)
    val pj = Pca.project(p, mu, comps).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!pj.contains("Join") && !pj.contains("Exchange"),
      "projection must be a row-local literal dot")
    assert(!pj.contains("ScalaUDF"))
  }
}
