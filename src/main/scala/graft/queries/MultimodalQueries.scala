package graft.queries

import graft.GraftQuery
import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal plumbing queries. `multimodal_meta` has a full DuckDB oracle
  * (metadata derivation is pure SQL); `multimodal_features` runs the stubbed
  * decode path and gets the rows-only check (the mapPartitions decoder has
  * no SQL twin by design).
  */
object MultimodalQueries {

  def all: Seq[GraftQuery] = Seq(

    GraftQuery("multimodal_meta",
      (s, d) => Multimodal.fromDocuments(Tables.documents(s, d))
        .groupBy("modality")
        .agg(count(lit(1)).as("n_media"),
          sum(octet_length(col("payload")).cast("long")).as("total_bytes"),
          min("media_id").as("min_id"))
        .orderBy("modality"),
      Some(
        """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
          |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
          |  count(*) AS n_media,
          |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
          |  min(doc_id) AS min_id
          |FROM documents GROUP BY 1 ORDER BY modality""".stripMargin)),

    GraftQuery("multimodal_features",
      (s, d) => Multimodal.extractFeatures(
        Multimodal.fromDocuments(Tables.documents(s, d)))
        .orderBy("media_id"),
      None) // stub decoder — rows-only check
  )
}
