package graft.queries

import graft.GraftQuery
import graft.functions.Stable.{fixMeanSql, stabSql}
import graft.operators.QualityClassifier
import graft.sources.Tables

/** The trained linear quality scorer — registry + DuckDB twins that
  * RE-TRAIN the model in SQL: the same feature table, the same
  * fixed-point moments, and the same 24 gradient rounds unrolled as
  * MATERIALIZED weight CTEs (each round is referenced twice — the next
  * gradient and the next update — so plain CTEs would square the tree
  * per round; the events_stationary lesson). The rational-sigmoid link
  * keeps every training op inside correctly-rounded IEEE arithmetic, so
  * unlike an exp()-based sigmoid there is no cross-engine libm hazard
  * anywhere — the weights hash-match exactly.
  */
object ClassifierQueries {

  private val LR = "0.5"
  private val ITERS = 24

  private def s6(x: String): String = stabSql(x, 6)

  /** Feature + label CTEs: the Gopher signal aggregate (the same tok/g
    * derivation as the text_gopher_quality oracle), raw features, label.
    */
  private val featCtes: String =
    s"""${SearchQueries.tokCte},
       |g AS (
       |  SELECT doc_id, count(*) AS n_words, sum(length(word)) AS sum_len,
       |    sum(CASE WHEN regexp_matches(word, '[a-z]') THEN 1 ELSE 0 END) AS n_alpha,
       |    sum(CASE WHEN word IN ('the','be','to','of','and','that','have','with')
       |        THEN 1 ELSE 0 END) AS n_stop
       |  FROM tok GROUP BY doc_id),
       |f AS MATERIALIZED (
       |  SELECT doc_id,
       |    ${s6("CAST(n_words AS DOUBLE) / (CAST(n_words AS DOUBLE) + 100.0)")} AS x1,
       |    ${s6("(CAST(sum_len AS DOUBLE) / n_words) / 10.0")} AS x2,
       |    ${s6("CAST(n_alpha AS DOUBLE) / n_words")} AS x3,
       |    ${s6("10.0 * CAST(n_stop AS DOUBLE) / n_words")} AS x4,
       |    CASE WHEN kp THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
       |    kp AS keep
       |  FROM (SELECT *, (n_words >= 50 AND n_words <= 100000
       |          AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
       |          AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
       |          AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
       |          AND n_stop >= 2) AS kp FROM g))""".stripMargin

  /** Moments + z-scored feature CTEs (zero-variance features pin std=1). */
  private val stdCtes: String = {
    val mo = (1 to 4).flatMap(j => Seq(
      s"${fixMeanSql(s"x$j")} AS m$j",
      s"${fixMeanSql(s"x$j*x$j")} AS q$j")).mkString(", ")
    val sd = (1 to 4).map { j =>
      val e = s6(s"sqrt(greatest(q$j - m$j*m$j, 0.0))")
      s"CASE WHEN $e = 0.0 THEN CAST(1.0 AS DOUBLE) ELSE $e END AS d$j"
    }.mkString(", ")
    val sf = (1 to 4).map(j => s"${s6(s"(x$j - sd.m$j) / sd.d$j")} AS s$j").mkString(", ")
    s"""mo AS MATERIALIZED (SELECT $mo FROM f),
       |sd AS MATERIALIZED (SELECT m1, m2, m3, m4, $sd FROM mo),
       |sf AS MATERIALIZED (SELECT doc_id, $sf, y, keep FROM f, sd)""".stripMargin
  }

  /** The margin / probability expressions over weight alias `w` and the
    * sf columns — textually identical fold to the Spark side.
    */
  private def zExpr(pfx: String = ""): String =
    s"w.c0 + w.c1*${pfx}s1 + w.c2*${pfx}s2 + w.c3*${pfx}s3 + w.c4*${pfx}s4"
  private def pExpr(pfx: String = ""): String =
    s6(s"0.5 + ((0.5 * (${zExpr(pfx)})) / (1.0 + abs(${zExpr(pfx)})))")

  /** The unrolled gradient-descent chain w0 … w$ITERS. */
  private val trainCtes: String = {
    val w0 = s"w0 AS (SELECT ${(0 to 4).map(j => s"CAST(0.0 AS DOUBLE) AS c$j").mkString(", ")})"
    val rounds = (1 to ITERS).map { r =>
      val grads = (0 to 4).map { j =>
        val term = if (j == 0) s"(${pExpr()}) - y" else s"((${pExpr()}) - y) * s$j"
        s"${fixMeanSql(term)} AS g$j"
      }.mkString(", ")
      val upd = (0 to 4).map(j => s"${s6(s"w.c$j - $LR*g.g$j")} AS c$j").mkString(", ")
      s"""gr$r AS MATERIALIZED (SELECT $grads FROM sf, w${r - 1} w),
         |w$r AS MATERIALIZED (SELECT $upd FROM w${r - 1} w, gr$r g)""".stripMargin
    }
    (w0 +: rounds).mkString(",\n")
  }

  private def lrCtes: String = s"$featCtes,\n$stdCtes,\n$trainCtes"

  def all: Seq[GraftQuery] = Seq(

    // The model card: per-feature moments + trained weight — the
    // artifact a pipeline persists next to the corpus snapshot. Gating
    // the weights gates the WHOLE training trajectory (any divergence in
    // any round moves them).
    GraftQuery("text_quality_lr_model",
      (s, d) => QualityClassifier.modelDf(s,
        QualityClassifier.train(Tables.documents(s, d))).orderBy("feature"),
      Some(
        s"""WITH $lrCtes
           |SELECT 'bias' AS feature, CAST(0.0 AS DOUBLE) AS mean,
           |       CAST(1.0 AS DOUBLE) AS std, w.c0 AS weight FROM w$ITERS w
           |UNION ALL SELECT 'len_sat', sd.m1, sd.d1, w.c1 FROM w$ITERS w, sd
           |UNION ALL SELECT 'mean_wlen', sd.m2, sd.d2, w.c2 FROM w$ITERS w, sd
           |UNION ALL SELECT 'alpha_frac', sd.m3, sd.d3, w.c3 FROM w$ITERS w, sd
           |UNION ALL SELECT 'stop_density', sd.m4, sd.d4, w.c4 FROM w$ITERS w, sd
           |ORDER BY feature""".stripMargin)),

    // Per-doc soft quality score (row-local, plan-literal weights)
    // alongside the rule battery's hard bit — the rankable signal
    // text_quality_topp-style selection consumes.
    GraftQuery("text_quality_lr_score",
      (s, d) => {
        val (m, f) = QualityClassifier.trainWithFeatures(Tables.documents(s, d))
        QualityClassifier.scoreFeatures(f, m).orderBy("doc_id")
      },
      Some(
        s"""WITH $lrCtes
           |SELECT sf.doc_id, ${pExpr("sf.")} AS score, sf.keep
           |FROM sf, w$ITERS w ORDER BY sf.doc_id""".stripMargin)),

    // "Keep the best 30%" by the learned score — the model-based
    // text_quality_topp: histogram threshold over micro-unit scores,
    // ties at the bar kept whole, window bounded by score cardinality.
    GraftQuery("text_quality_lr_select",
      (s, d) => {
        val (m, f) = QualityClassifier.trainWithFeatures(Tables.documents(s, d))
        QualityClassifier.selectTopP(QualityClassifier.scoreFeatures(f, m), 0.3)
          .orderBy("doc_id")
      },
      Some(
        s"""WITH $lrCtes,
           |sc AS (SELECT sf.doc_id,
           |         CAST(floor((${pExpr("sf.")}) * 1000000.0 + 0.5) AS BIGINT) AS s_micro
           |       FROM sf, w$ITERS w),
           |h AS (SELECT s_micro, count(*) AS c FROM sc GROUP BY s_micro),
           |cm AS (SELECT s_micro, sum(c) OVER (ORDER BY s_micro DESC) AS cum FROM h),
           |t AS (
           |  SELECT max(s_micro) AS s_star
           |  FROM cm, (SELECT count(*) AS n FROM sc) tot
           |  WHERE cum >= floor(0.3 * n + 1e-9))
           |SELECT doc_id, s_micro FROM sc, t
           |WHERE s_micro >= s_star ORDER BY doc_id""".stripMargin)),

    // Confusion card of score ≥ 0.5 vs the distilled rule labels — the
    // number that says whether the soft scorer can stand in for the
    // battery (a linear model tops out near 0.9 on an AND-of-bands
    // concept; the gate pins the exact counts).
    GraftQuery("text_quality_lr_eval",
      (s, d) => {
        val (m, f) = QualityClassifier.trainWithFeatures(Tables.documents(s, d))
        QualityClassifier.evaluate(QualityClassifier.scoreFeatures(f, m))
      },
      Some(
        s"""WITH $lrCtes,
           |sc AS (SELECT ${pExpr("sf.")} AS score, sf.keep FROM sf, w$ITERS w)
           |SELECT count(*) AS n,
           |  CAST(sum(CASE WHEN score >= 0.5 AND keep THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(sum(CASE WHEN score >= 0.5 AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(sum(CASE WHEN score < 0.5 AND keep THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |  CAST(sum(CASE WHEN score < 0.5 AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           |  CAST(sum(CASE WHEN (score >= 0.5) = keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS accuracy
           |FROM sc""".stripMargin)),

    // Reliability card — observed positive rate per score decile: the
    // calibration diagnostic behind every threshold-based quota (if
    // "score 0.8" doesn't mean ~80%, top-P selection budgets are wrong).
    // Bounded-cardinality aggregate; bin means ride the fixMean path.
    GraftQuery("text_quality_lr_calibration",
      (s, d) => {
        val (m, f) = QualityClassifier.trainWithFeatures(Tables.documents(s, d))
        QualityClassifier.calibration(QualityClassifier.scoreFeatures(f, m))
          .orderBy("bin")
      },
      Some(
        s"""WITH $lrCtes,
           |sc AS (SELECT ${pExpr("sf.")} AS score, sf.keep FROM sf, w$ITERS w),
           |b AS (SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin, score, keep FROM sc)
           |SELECT bin, count(*) AS n,
           |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           |  ${fixMeanSql("score")} AS mean_score,
           |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS frac_pos
           |FROM b GROUP BY bin ORDER BY bin""".stripMargin))
  )
}
