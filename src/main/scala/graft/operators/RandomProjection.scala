package graft.operators

import graft.functions.Stable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue

/** Johnson–Lindenstrauss random projection of the embedding column — the
  * data-INDEPENDENT dimensionality reduction (Achlioptas 2001: ±1
  * Rademacher entries satisfy the JL lemma): y = (1/√k)·R·x for a fixed
  * k×d sign matrix. Complements PCA: no training pass, no corpus
  * statistics, distance preservation within (1±ε) whp — the reduction a
  * pipeline uses when it can't afford (or can't trust) a fitted model,
  * and the standard pre-step before LSH or clustering at extreme scale.
  *
  * The matrix reuses Similarity.hyperplanes' md5-parity derivation, so
  * both engines build bit-identical planes from pure digest arithmetic.
  * With ±1 weights every product is an exact sign flip, the dot folds in
  * index order (ArrayDot/list_sum contract), and 1/√k is exact for
  * power-of-4 k — the only stabilizer is the final stab(6).
  *
  * Scale shape: the projection is a row-local codegen'd expression
  * against k plan-literal planes (k is small by construction — at the
  * 1024-plane LSH tier the literal spelling measurably drowned the
  * optimizer, so THAT path joins a broadcast plane table instead; see
  * signBandRows). No join, no shuffle, no training job. The distortion
  * card samples a bounded id range, so its pair join is metadata-sized
  * regardless of corpus scale.
  */
object RandomProjection {

  private def dot(a: Column, b: Column): Column =
    graftglue.column(graft.functions.ArrayDot(
      graftglue.expression(a), graftglue.expression(b)))

  /** The reduced k-vector as a row-local array expression. */
  def rpArray(e: Column, planes: Array[Array[Double]]): Column = {
    val scale = math.sqrt(planes.length.toDouble)
    array(planes.map(p =>
      Stable.stab(dot(e, typedLit(p.toSeq)) / lit(scale), 6)): _*)
  }

  /** Reduced coordinates as rows (vec_id, j, y), 1-based j. */
  def project(prep: DataFrame, k: Int = 16): DataFrame = {
    val planes = Similarity.hyperplanes(k, 64)
    prep.select(col("vec_id"), posexplode(rpArray(col("e"), planes)).as(Seq("pos", "y")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("j"), col("y"))
  }

  /** The JL quality card: for every pair in a bounded id sample, the
    * original-space and reduced-space L2 distances and their ratio —
    * the empirical (1±ε) the lemma promises. Both sides of the pair join
    * are ≤ `sample` rows (broadcast), so this is metadata-sized at any
    * corpus scale.
    */
  def distortion(prep: DataFrame, k: Int = 16, sample: Int = 32): DataFrame = {
    val planes = Similarity.hyperplanes(k, 64)
    val s = prep.filter(col("vec_id") < sample)
      .select(col("vec_id"), col("e"), rpArray(col("e"), planes).as("r"))
    def l2(a: Column, b: Column): Column = {
      val df = zip_with(a, b, (x, y) => x - y)
      Stable.stab(sqrt(dot(df, df)), 6)
    }
    broadcast(s).as("a").join(s.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        l2(col("a.e"), col("b.e")).as("d_orig"),
        l2(col("a.r"), col("b.r")).as("d_rp"))
      .select(col("va"), col("vb"), col("d_orig"), col("d_rp"),
        Stable.stab(col("d_rp") / col("d_orig"), 6).as("ratio"))
  }
}
