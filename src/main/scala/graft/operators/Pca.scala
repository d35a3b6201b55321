package graft.operators

import graft.functions.Stable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue

/** Principal-component analysis over the `embeddings` table — the
  * dimensionality-reduction / whitening step an embedding-curation
  * pipeline runs before clustering or semantic dedup (SemDeDup and its
  * descendants PCA-reduce before cosine bucketing; retrieval stacks
  * PCA-compress vectors before PQ).
  *
  * Decomposition follows the repo's two-tier contract for iterative
  * linear algebra (the k-means / events_stationary playbook):
  *
  *  1. CORPUS-SCALE, one pass each: the d-bounded mean vector and the
  *     d²-bounded covariance matrix are Spark aggregates with map-side
  *     partials — the only stages that touch the vectors. The per-row d²
  *     product kernel rides the buffer-vectorized
  *     [[graft.functions.OuterFixSumAgg]] (round 18 — one flat long-array
  *     buffer per task instead of a d²-row posexplode through a keyed
  *     hash aggregate; the retired codegen explode kernel
  *     [[graft.functions.OuterProductFlat]] remains spec-pinned to the
  *     HOF spelling); every product is quantized to a scale-8 fixed-point
  *     long before summing (see fixMean), so the corpus sums are exact
  *     and order-free — no partition-order nondeterminism, bit-identical
  *     in DuckDB — while staying on an exact int64 path.
  *  2. METADATA-SCALE: the d² covariance (4 096 doubles at d=64) is
  *     collected under the k-means centroid contract and the top-k
  *     eigenpairs run as fixed-round power iteration + deflation in
  *     driver arithmetic that replicates the SQL expression semantics
  *     bit-for-bit (`BigDecimal.valueOf` = the double→DECIMAL(28,12)
  *     cast, exact decimal adds, correctly-rounded doubleValue = the
  *     VARCHAR-hop DECIMAL→DOUBLE cast, IEEE sqrt, stab(6) collapse) —
  *     so an oracle that unrolls the same rounds in DuckDB hash-matches
  *     step for step, and zero Spark jobs run per round.
  *
  * At 100 TB the shape holds: pass 1–2 are linear scans whose shuffles
  * carry ≤ d² rows per map task (partial aggregation), the driver holds
  * d² values regardless of corpus size, and the projection is a row-local
  * codegen'd dot against plan-literal components.
  *
  * Determinism notes: power iteration from the all-positive uniform start
  * vector has no sign ambiguity (covariance is PSD, so the dominant
  * Rayleigh quotient is ≥ 0 and the iterate never flips); convergence in
  * `iters` fixed rounds is corpus-dependent, but both engines run the
  * SAME rounds, so the gate compares identical sequences either way —
  * the eigenpair claims in PcaSpec are where convergence is asserted.
  */
object Pca {

  /** One principal component: 1-based id, loading vector, eigenvalue
    * estimate (the final iterate's ‖C·v‖, stab(6)'d).
    */
  final case class Component(comp: Int, v: Array[Double], lambda: Double)

  /** The covariance/mean sums ride Stable.fixMean — exact order-free
    * scale-8 fixed-point int64 means (chosen over DECIMAL(28,12), whose
    * > 18-digit buffer leaves Spark's long fast path; see Stable).
    */
  private def fixMean(x: Column, n: Column): Column = Stable.fixMean(x, n)

  /** The stab(6)'d per-dimension mean vector, collected (d doubles — the
    * centroid metadata contract). `prep` is Similarity.prepared's
    * (vec_id, e) shape; one posexplode pass, d-bounded hash aggregate.
    */
  def meanVector(prep: DataFrame): Array[Double] =
    prep.select(posexplode(col("e")).as(Seq("pos", "x")))
      .groupBy("pos").agg(fixMean(col("x"), count(lit(1))).as("m"))
      .orderBy("pos").select("m")
      .collect().map(_.getDouble(0))

  /** Centered array e − mu (mu a plan literal — exact IEEE subtraction,
    * identical in the DuckDB twin).
    */
  def centered(e: Column, mu: Array[Double]): Column =
    zip_with(e, typedLit(mu.toSeq), (x, m) => x - m)

  /** The population covariance matrix as (i, j, c) rows, 1-based indices,
    * c = stab6(Σ (xᵢ−μᵢ)(xⱼ−μⱼ) / n) with the Σ an exact fixed-point sum.
    * ONE corpus pass, buffer-vectorized (round 18): the per-row d²
    * quantized products accumulate into one flat long-array aggregation
    * buffer ([[graft.functions.OuterFixSumAgg]] — bit-identical
    * arithmetic to the previous posexplode + (i,j)-keyed fixMean
    * aggregate, measured ~2.4× on the pass at sf0.1), and only the
    * d²-row RESULT is exploded for the division/stab tail — which is the
    * same expression sequence fixMean applied per group.
    */
  def covariance(prep: DataFrame, mu: Array[Double]): DataFrame = {
    val d = mu.length
    val agg = org.apache.spark.sql.functions.udaf(new graft.functions.OuterFixSumAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    prep.select(centered(col("e"), mu).as("ec"))
      .agg(agg(col("ec")).as("r"))
      .select(col("r._2").as("n"), posexplode(col("r._1")).as(Seq("pos", "sq")))
      .select(
        ((col("pos") / lit(d)).cast("int") + 1).as("i"),
        (pmod(col("pos"), lit(d)).cast("int") + 1).as("j"),
        Stable.stab((col("sq").cast("double") / lit(1e8)) / col("n"), 6).as("c"))
  }

  /** Top-k eigenpairs of the collected covariance by `iters` fixed rounds
    * of power iteration per component, deflating between components —
    * driver arithmetic replicating the SQL unroll bit-for-bit (see the
    * object doc). `covRows` are the (i, j, c) covariance entries.
    */
  def powerComponents(covRows: Array[(Int, Int, Double)], d: Int,
                      k: Int = 2, iters: Int = 32): Seq[Component] = {
    import java.math.{BigDecimal => JBig, RoundingMode}
    // JBig.valueOf = Double.toString (shortest decimal) then setScale —
    // the verified double→DECIMAL(28,12) cast path of both engines.
    def dec(x: Double): JBig = JBig.valueOf(x).setScale(12, RoundingMode.HALF_UP)
    def stab6(x: Double): Double = graft.functions.Stable.stab6(x)
    val c = Array.ofDim[Double](d, d)
    covRows.foreach { case (i, j, v) => c(i - 1)(j - 1) = v }
    val v0 = stab6(1.0 / math.sqrt(d.toDouble))
    (1 to k).map { comp =>
      var v = Array.fill(d)(v0)
      var nrm = 0.0
      for (_ <- 1 to iters) {
        // u = C·v, each element an exact decimal sum of dec(c·v) terms
        val u = Array.tabulate(d) { i =>
          var s = JBig.ZERO
          var j = 0
          while (j < d) { s = s.add(dec(c(i)(j) * v(j))); j += 1 }
          s.doubleValue
        }
        var s2 = JBig.ZERO
        u.foreach(x => s2 = s2.add(dec(x * x)))
        nrm = math.sqrt(s2.doubleValue)
        v = u.map(x => stab6(x / nrm))
      }
      val lam = stab6(nrm)
      // deflate: C ← stab6(C − λ·v·vᵀ), same literal fold as the SQL twin
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { c(i)(j) = stab6(c(i)(j) - lam * v(i) * v(j)); j += 1 }
        i += 1
      }
      Component(comp, v, lam)
    }
  }

  /** End-to-end trainer: mean pass, covariance pass, driver eigenpairs. */
  def fit(prep: DataFrame, k: Int = 2, iters: Int = 32): (Array[Double], Seq[Component]) = {
    val mu = meanVector(prep)
    val covRows = covariance(prep, mu)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    (mu, powerComponents(covRows, mu.length, k, iters))
  }

  /** Row-local projection of every vector onto the fitted components:
    * pcₖ = stab6((e − μ)·vₖ), the dot folded in index order (the
    * ArrayDot / list_sum contract). Components ride as plan literals —
    * no join, no shuffle, whole-stage codegen end to end.
    */
  def project(prep: DataFrame, mu: Array[Double], comps: Seq[Component]): DataFrame = {
    val ec = centered(col("e"), mu)
    val cols = comps.map { cp =>
      Stable.stab(graftglue.column(graft.functions.ArrayDot(
        graftglue.expression(ec),
        graftglue.expression(typedLit(cp.v.toSeq)))), 6).as(s"pc${cp.comp}")
    }
    prep.select(col("vec_id") +: cols: _*)
  }

  /** Whitened projection: pcₖ/√λₖ — unit variance per component, the
    * normalization semantic-dedup pipelines apply before cosine
    * thresholds so one dominant direction can't swamp the metric. Same
    * row-local literal-dot plan as `project`, one extra division per
    * component (λ from the driver fit, √ correctly rounded both
    * engines).
    */
  def whiten(prep: DataFrame, mu: Array[Double], comps: Seq[Component]): DataFrame = {
    val ec = centered(col("e"), mu)
    val cols = comps.map { cp =>
      val pc = graftglue.column(graft.functions.ArrayDot(
        graftglue.expression(ec),
        graftglue.expression(typedLit(cp.v.toSeq))))
      Stable.stab(pc / lit(math.sqrt(cp.lambda)), 6).as(s"w${cp.comp}")
    }
    prep.select(col("vec_id") +: cols: _*)
  }

  /** The explained-variance card: (component, eigenvalue, var_frac) with
    * var_frac = stab6(λ / trace(C)), trace an exact decimal sum of the
    * stab'd diagonal. One-row-per-component local result — the artifact a
    * pipeline logs next to the fitted components.
    */
  def varianceProfile(covRows: Array[(Int, Int, Double)], comps: Seq[Component]): Seq[(Int, Double, Double)] = {
    import java.math.{BigDecimal => JBig, RoundingMode}
    def stab6(x: Double): Double = graft.functions.Stable.stab6(x)
    var t = JBig.ZERO
    covRows.foreach { case (i, j, v) =>
      if (i == j) t = t.add(JBig.valueOf(v).setScale(12, RoundingMode.HALF_UP))
    }
    val trace = t.doubleValue
    comps.map(cp => (cp.comp, cp.lambda, stab6(cp.lambda / trace)))
  }
}
