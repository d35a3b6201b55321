package graft.queries

import graft.GraftQuery
import graft.functions.Stable.stabSql
import graft.operators.Pca
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA over the embeddings table — registry + full DuckDB oracles.
  *
  * The oracles RE-DERIVE everything from the parquet bytes (the k-means
  * re-train discipline): the mean and covariance as exact decimal
  * aggregates, then the same fixed power-iteration rounds the driver
  * arithmetic runs, unrolled as MATERIALIZED step CTEs (DuckDB inlines
  * plain CTEs; each round is referenced twice downstream, so inlining
  * would square the tree per round — the events_stationary lesson).
  */
object PcaQueries {

  private val D = 64          // embedding dimension of the corpus tables
  private val ITERS = 32      // fixed power-iteration rounds per component

  /** Exact order-free decimal sum surfaced as double, scale 12. The
    * VARCHAR hop is the correctly-rounded DECIMAL→DOUBLE path (see
    * Stable.dsumSql).
    */
  private def dsum12(x: String): String =
    s"CAST(CAST(sum(CAST(($x) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)"

  private def s6(x: String): String = stabSql(x, 6)

  private def fixMeanSql(x: String): String = graft.functions.Stable.fixMeanSql(x)

  /** Prepared vectors + 1-based index table + mean + covariance CTEs —
    * the corpus-scale stages, shared by every oracle.
    */
  private val covCtes: String =
    s"""pv AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |ix AS (SELECT unnest(range(1, ${D + 1})) AS i),
       |mu AS MATERIALIZED (
       |  SELECT t.i, ${fixMeanSql("e[t.i]")} AS m
       |  FROM pv, unnest(range(1, ${D + 1})) t(i) GROUP BY t.i),
       |cv AS MATERIALIZED (
       |  SELECT CAST(i.i AS INTEGER) AS i, CAST(j.i AS INTEGER) AS j,
       |    ${fixMeanSql("(s.e[i.i] - mi.m) * (s.e[j.i] - mj.m)")} AS c
       |  FROM pv s, ix i, ix j, mu mi, mu mj
       |  WHERE mi.i = i.i AND mj.i = j.i
       |  GROUP BY i.i, j.i)""".stripMargin

  /** The unrolled power-iteration chain `{p}v0 … {p}v$ITERS` over
    * covariance table `src`, plus the eigenvalue CTE `l$p` (the final
    * round's ‖C·v‖, stab(6)'d — identical to the driver's lambda).
    */
  private def powerChain(p: String, src: String): String = {
    val v0 = (math.floor(1.0 / math.sqrt(D.toDouble) * 1e6 + 0.5) / 1e6).toString
    val seed = s"${p}v0 AS (SELECT i, CAST($v0 AS DOUBLE) AS v FROM ix)"
    val rounds = (1 to ITERS).map { r =>
      s"""${p}u$r AS MATERIALIZED (
         |  SELECT c.i, ${dsum12("c.c * v.v")} AS u
         |  FROM $src c, ${p}v${r - 1} v WHERE v.i = c.j GROUP BY c.i),
         |${p}n$r AS MATERIALIZED (
         |  SELECT sqrt(${dsum12("u * u")}) AS nrm FROM ${p}u$r),
         |${p}v$r AS MATERIALIZED (
         |  SELECT i, ${s6(s"u / (SELECT nrm FROM ${p}n$r)")} AS v FROM ${p}u$r)""".stripMargin
    }
    val lam = s"l$p AS (SELECT ${s6("nrm")} AS l FROM ${p}n$ITERS)"
    (seed +: rounds :+ lam).mkString(",\n")
  }

  /** Both components: PC1 over cv, deflation, PC2 over the deflated cw. */
  private val eigenCtes: String =
    s"""${powerChain("a", "cv")},
       |cw AS MATERIALIZED (
       |  SELECT c.i, c.j, ${s6("c.c - ((l.l * a.v) * b.v)")} AS c
       |  FROM cv c, la l, av$ITERS a, av$ITERS b
       |  WHERE a.i = c.i AND b.i = c.j),
       |${powerChain("b", "cw")}""".stripMargin

  private def prepE(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), graft.operators.Similarity.toDouble(col("embedding")).as("e"))

  def all: Seq[GraftQuery] = Seq(

    // The covariance matrix itself — the one corpus-scale pass of the
    // PCA pipeline (codegen'd per-row outer product, exact decimal sums,
    // d²-bounded hash aggregate) and the artifact the eigensolver
    // consumes. Gated directly so the metadata handed to the driver
    // arithmetic is itself hash-verified.
    GraftQuery("emb_pca_cov",
      (s, d) => {
        val p = prepE(s, d)
        Pca.covariance(p, Pca.meanVector(p)).orderBy("i", "j")
      },
      Some(
        s"""WITH $covCtes
           |SELECT i, j, c FROM cv ORDER BY i, j""".stripMargin)),

    // Explained-variance card: eigenvalue + fraction-of-trace for the
    // top-2 components — the "how much signal survives the reduction"
    // number a pipeline logs before committing to a compressed index.
    GraftQuery("emb_pca_var",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val p = prepE(s, d)
        val mu = Pca.meanVector(p)
        val covRows = Pca.covariance(p, mu)
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        val comps = Pca.powerComponents(covRows, mu.length, k = 2, iters = ITERS)
        Pca.varianceProfile(covRows, comps)
          .toDF("component", "eigenvalue", "var_frac")
          .orderBy("component")
      },
      Some(
        s"""WITH $covCtes,
           |$eigenCtes,
           |tr AS (SELECT ${dsum12("c")} AS t FROM cv WHERE i = j)
           |SELECT CAST(1 AS INTEGER) AS component, l.l AS eigenvalue,
           |       ${s6("l.l / tr.t")} AS var_frac FROM la l, tr
           |UNION ALL
           |SELECT CAST(2 AS INTEGER), l.l, ${s6("l.l / tr.t")} FROM lb l, tr
           |ORDER BY component""".stripMargin)),

    // Whitened projection pcₖ/√λₖ — unit variance per component, the
    // normalization semantic-dedup applies before cosine thresholds.
    GraftQuery("emb_pca_whiten",
      (s, d) => {
        val p = prepE(s, d)
        val (mu, comps) = Pca.fit(p, k = 2, iters = ITERS)
        Pca.whiten(p, mu, comps).orderBy("vec_id")
      },
      Some(
        s"""WITH $covCtes,
           |$eigenCtes,
           |mul AS (SELECT list(m ORDER BY i) AS m FROM mu),
           |c1 AS (SELECT list(v ORDER BY i) AS v FROM av$ITERS),
           |c2 AS (SELECT list(v ORDER BY i) AS v FROM bv$ITERS)
           |SELECT s.vec_id,
           |  ${s6(s"list_sum(list_transform(range(1, ${D + 1}), q -> (s.e[q] - m.m[q]) * c1.v[q])) / sqrt((SELECT l FROM la))")} AS w1,
           |  ${s6(s"list_sum(list_transform(range(1, ${D + 1}), q -> (s.e[q] - m.m[q]) * c2.v[q])) / sqrt((SELECT l FROM lb))")} AS w2
           |FROM pv s, mul m, c1, c2
           |ORDER BY vec_id""".stripMargin)),

    // Row-local projection of the corpus onto the fitted top-2
    // components (plan-literal loadings, codegen'd centered dot) — the
    // reduced representation downstream clustering / visualization /
    // semantic-dedup stages consume.
    GraftQuery("emb_pca_project",
      (s, d) => {
        val p = prepE(s, d)
        val (mu, comps) = Pca.fit(p, k = 2, iters = ITERS)
        Pca.project(p, mu, comps).orderBy("vec_id")
      },
      Some(
        s"""WITH $covCtes,
           |$eigenCtes,
           |mul AS (SELECT list(m ORDER BY i) AS m FROM mu),
           |c1 AS (SELECT list(v ORDER BY i) AS v FROM av$ITERS),
           |c2 AS (SELECT list(v ORDER BY i) AS v FROM bv$ITERS)
           |SELECT s.vec_id,
           |  ${s6(s"list_sum(list_transform(range(1, ${D + 1}), q -> (s.e[q] - m.m[q]) * c1.v[q]))")} AS pc1,
           |  ${s6(s"list_sum(list_transform(range(1, ${D + 1}), q -> (s.e[q] - m.m[q]) * c2.v[q]))")} AS pc2
           |FROM pv s, mul m, c1, c2
           |ORDER BY vec_id""".stripMargin))
  )
}
