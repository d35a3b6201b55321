package graft.queries

import graft.GraftQuery
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Text-analysis suite over `documents`, with DuckDB oracles. */
object TextAnalysisQueries {

  val stopListSql: String =
    TextAnalysis.Stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  def all: Seq[GraftQuery] = Seq(

    GraftQuery("text_token_stats",
      (s, d) => TextAnalysis.tokenStats(Tables.documents(s, d)).orderBy("doc_id"),
      Some(
        s"""WITH ${SearchQueries.tokCte}
           |SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_unique,
           |  CAST(sum(length(word)) AS DOUBLE) / count(*) AS avg_token_len,
           |  CAST(count(DISTINCT word) AS DOUBLE) / count(*) AS ttr
           |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    GraftQuery("text_quality",
      (s, d) => TextAnalysis.qualityScore(Tables.documents(s, d)).orderBy("doc_id"),
      Some(
        s"""WITH ${SearchQueries.tokCte},
           |f AS (
           |  SELECT doc_id, count(*) AS n_tokens,
           |    CAST(sum(CASE WHEN word IN $stopListSql THEN 1 ELSE 0 END) AS DOUBLE)
           |      / count(*) AS stopword_ratio,
           |    CAST(sum(CASE WHEN regexp_matches(word, '[0-9]') THEN 1 ELSE 0 END) AS DOUBLE)
           |      / count(*) AS digit_ratio,
           |    CAST(count(DISTINCT word) AS DOUBLE) / count(*) AS ttr
           |  FROM tok GROUP BY doc_id)
           |SELECT doc_id, n_tokens, stopword_ratio, digit_ratio, ttr,
           |  least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * ttr * (1.0 - digit_ratio) AS quality
           |FROM f ORDER BY doc_id""".stripMargin)),

    GraftQuery("text_langid",
      (s, d) => TextAnalysis.langId(Tables.documents(s, d)).orderBy("doc_id"),
      Some(
        s"""WITH ${SearchQueries.tokCte},
           |r AS (
           |  SELECT doc_id,
           |    CAST(sum(CASE WHEN word IN $stopListSql THEN 1 ELSE 0 END) AS DOUBLE)
           |      / count(*) AS stopword_ratio
           |  FROM tok GROUP BY doc_id)
           |SELECT r.doc_id, d.lang,
           |  CASE WHEN r.stopword_ratio >= 0.02 THEN 'en' ELSE 'und' END AS lang_pred,
           |  r.stopword_ratio,
           |  (CASE WHEN r.stopword_ratio >= 0.02 THEN 'en' ELSE 'und' END) = d.lang AS is_match
           |FROM r JOIN documents d ON r.doc_id = d.doc_id
           |ORDER BY r.doc_id""".stripMargin)),

    GraftQuery("text_fingerprint",
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d)).orderBy("doc_id"),
      Some(
        s"""WITH ${DedupQueries.shingleCte}
           |SELECT doc_id, min(md5(shingle)) AS fingerprint
           |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    GraftQuery("text_token_counts",
      (s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d)).orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  len(list_filter(regexp_split_to_array(text, '\s+'), w -> length(w) > 0))::BIGINT AS ws_tokens,
          |  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), w -> length(w) > 0))::BIGINT AS alnum_tokens
          |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
