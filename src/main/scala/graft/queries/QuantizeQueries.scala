package graft.queries

import graft.GraftQuery
import graft.functions.Stable.stabSql
import graft.operators.{Quantize, Similarity}
import graft.sources.Tables

/** int8 scalar quantization of the embeddings — registry + DuckDB twins
  * that re-derive the bounds, codes, roundtrip, and quantized serving
  * output from the parquet bytes. Every arithmetic chain is written with
  * identical fold order on both sides; bounds are min/max picks, so the
  * only stabilizers are on the error/cosine folds.
  */
object QuantizeQueries {

  private val D = 64

  private def s6(x: String): String = stabSql(x, 6)

  /** Prepared vectors + per-dim bounds + bounds-as-lists CTEs. */
  private val bdCtes: String =
    s"""v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |bd AS MATERIALIZED (
       |  SELECT t.i, min(e[t.i]) AS lo, max(e[t.i]) AS hi
       |  FROM v, unnest(range(1, ${D + 1})) t(i) GROUP BY t.i),
       |bl AS (SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi FROM bd)""".stripMargin

  /** The per-element code expression over row alias `s`, bounds alias
    * `b`, index expression `ix` — textually the Quantize.codeExpr fold.
    */
  private def codeSql(ix: String): String =
    s"CASE WHEN b.hi[$ix] = b.lo[$ix] THEN CAST(0.0 AS DOUBLE) " +
      s"ELSE floor((s.e[$ix] - b.lo[$ix]) * 255.0 / (b.hi[$ix] - b.lo[$ix]) + 0.5) END"

  /** Dequantized element x̂ = lo + code·((hi−lo)/255). */
  private def deqSql(ix: String): String =
    s"(b.lo[$ix] + ((${codeSql(ix)}) * ((b.hi[$ix] - b.lo[$ix]) / 255.0)))"

  def all: Seq[GraftQuery] = Seq(

    // The per-dimension [lo, hi] calibration table — one corpus pass,
    // d-row output; the artifact the quantizer ships with the codes.
    GraftQuery("emb_sq8_bounds",
      (s, d) => Quantize.boundsDf(Similarity.prepared(Tables.embeddings(s, d))
          .select("vec_id", "e"))
        .orderBy("i"),
      Some(
        s"""WITH $bdCtes
           |SELECT CAST(i AS INTEGER) AS i, lo, hi FROM bd ORDER BY i""".stripMargin)),

    // The int8 code table (vec_id, i, code) — 4× smaller than the float
    // column it replaces; row-local projection against literal bounds.
    GraftQuery("emb_sq8_codes",
      (s, d) => {
        val p = Similarity.prepared(Tables.embeddings(s, d)).select("vec_id", "e")
        val (lo, hi) = Quantize.bounds(p)
        Quantize.codes(p, lo, hi).orderBy("vec_id", "i")
      },
      Some(
        s"""WITH $bdCtes
           |SELECT s.vec_id, CAST(t.i AS INTEGER) AS i,
           |  CAST(${codeSql("t.i")} AS INTEGER) AS code
           |FROM v s, bl b, unnest(range(1, ${D + 1})) t(i)
           |ORDER BY vec_id, i""".stripMargin)),

    // Reconstruction card: per-vector L2 error and original↔dequantized
    // cosine — the "is 8 bits enough for this corpus" QA number.
    GraftQuery("emb_sq8_error",
      (s, d) => {
        val p = Similarity.prepared(Tables.embeddings(s, d)).select("vec_id", "e")
        val (lo, hi) = Quantize.bounds(p)
        Quantize.reconError(p, lo, hi).orderBy("vec_id")
      },
      Some {
        val rng = s"range(1, ${D + 1})"
        s"""WITH $bdCtes
           |SELECT s.vec_id,
           |  ${s6(s"sqrt(list_sum(list_transform($rng, i -> (s.e[i] - ${deqSql("i")}) * (s.e[i] - ${deqSql("i")}))))")} AS l2_err,
           |  ${s6(s"list_sum(list_transform($rng, i -> s.e[i] * ${deqSql("i")}))" +
                s" / (sqrt(list_sum(list_transform($rng, i -> s.e[i] * s.e[i])))" +
                s" * sqrt(list_sum(list_transform($rng, i -> ${deqSql("i")} * ${deqSql("i")}))))")} AS cos
           |FROM v s, bl b
           |ORDER BY vec_id""".stripMargin
      }),

    // The SQ8 serving tier: brute top-k cosine over dequantized vectors
    // (knn_brute's shape at a quarter of the resident bytes) — ranked
    // against knn_brute by eye, gated exactly here.
    GraftQuery("knn_sq8",
      (s, d) => Quantize.knnSq8(Tables.embeddings(s, d), 10, 5)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank"),
      Some(
        s"""WITH $bdCtes,
           |dq AS MATERIALIZED (
           |  SELECT s.vec_id, list_transform(range(1, ${D + 1}), i -> ${deqSql("i")}) AS e
           |  FROM v s, bl b),
           |nq AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm FROM dq),
           |c AS (
           |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, ${SimilarityQueries.cosSql("a", "b")} AS cos
           |  FROM nq a JOIN nq b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
           |r AS (SELECT query_id, neighbor_id, cos,
           |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |      FROM c)
           |SELECT query_id, neighbor_id, cos, rank FROM r
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))
  )
}
