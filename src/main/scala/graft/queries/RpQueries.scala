package graft.queries

import graft.GraftQuery
import graft.functions.Stable.stabSql
import graft.operators.{RandomProjection, Similarity}
import graft.sources.Tables

/** Johnson–Lindenstrauss random projection — registry + DuckDB twins
  * that re-derive the ±1 plane matrix from the same md5-parity digest
  * arithmetic (the sign-bit LSH oracle's replay) and re-run the
  * projection and the pair-distance card with identical folds.
  */
object RpQueries {

  private val D = 64
  private val K = 16
  private val SAMPLE = 32

  private def s6(x: String): String = stabSql(x, 6)

  private val rpCtes: String =
    s"""pv AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |w AS (
       |  SELECT j, i,
       |    CASE WHEN CAST(CONCAT('0x', substring(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
       |         THEN 1.0 ELSE -1.0 END AS v
       |  FROM range(0, $K) t1(j), range(1, ${D + 1}) t2(i)),
       |wl AS (SELECT j, list(v ORDER BY i) AS wv FROM w GROUP BY j),
       |pj AS MATERIALIZED (
       |  SELECT n.vec_id, wl.j,
       |    ${s6(s"list_sum(list_transform(range(1, ${D + 1}), i -> n.e[i] * wl.wv[i])) / ${math.sqrt(K.toDouble)}")} AS y
       |  FROM pv n, wl)""".stripMargin

  private def prepE(s: org.apache.spark.sql.SparkSession, d: String) =
    Similarity.prepared(Tables.embeddings(s, d)).select("vec_id", "e")

  def all: Seq[GraftQuery] = Seq(

    // The reduced coordinates (vec_id, j, y) — 4× fewer dimensions with
    // no training pass; row-local codegen'd dots against 16 literal
    // planes.
    GraftQuery("emb_rp_project",
      (s, d) => RandomProjection.project(prepE(s, d), K).orderBy("vec_id", "j"),
      Some(
        s"""WITH $rpCtes
           |SELECT vec_id, CAST(j + 1 AS INTEGER) AS j, y FROM pj
           |ORDER BY vec_id, j""".stripMargin)),

    // The empirical JL card over a bounded pair sample: reduced/original
    // L2 ratio per pair — the (1±ε) the lemma promises, measured.
    GraftQuery("emb_rp_distortion",
      (s, d) => RandomProjection.distortion(prepE(s, d), K, SAMPLE)
        .orderBy("va", "vb"),
      Some(
        s"""WITH $rpCtes,
           |rp AS (SELECT vec_id, list(y ORDER BY j) AS r FROM pj GROUP BY vec_id),
           |pr AS (
           |  SELECT a.vec_id AS va, b.vec_id AS vb,
           |    ${s6(s"sqrt(list_sum(list_transform(range(1, ${D + 1}), i -> (a.e[i] - b.e[i]) * (a.e[i] - b.e[i]))))")} AS d_orig,
           |    ${s6(s"sqrt(list_sum(list_transform(range(1, ${K + 1}), q -> (ra.r[q] - rb.r[q]) * (ra.r[q] - rb.r[q]))))")} AS d_rp
           |  FROM pv a, pv b, rp ra, rp rb
           |  WHERE a.vec_id < b.vec_id AND b.vec_id < $SAMPLE
           |    AND ra.vec_id = a.vec_id AND rb.vec_id = b.vec_id)
           |SELECT va, vb, d_orig, d_rp, ${s6("d_rp / d_orig")} AS ratio FROM pr
           |ORDER BY va, vb""".stripMargin))
  )
}
