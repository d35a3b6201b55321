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
        Multimodal.withRealImages(Tables.documents(s, d)))
        .orderBy("media_id"),
      None), // image rows decode real PNGs; audio/video stay stubbed — rows-only check

    // Real-codec round trip, oracle-checked: image payloads are valid PNGs
    // (javax.imageio encode at synthesis), and width/height come from
    // javax.imageio DECODING those bytes. The oracle re-derives the
    // fixture's dimension contract (Multimodal.imageDims) from doc_id — a
    // wrong header parse, stride bug, or synthesis drift all hash-fail.
    GraftQuery("multimodal_image_dims",
      (s, d) => Multimodal.decodeImageDims(
        Multimodal.withRealImages(
          Tables.documents(s, d).filter(col("doc_id") % 3 === 0)))
        .orderBy("media_id"),
      Some(
        """SELECT doc_id AS media_id,
          |  CAST(4 + doc_id % 16 AS INT) AS width,
          |  CAST(4 + (doc_id // 16) % 16 AS INT) AS height
          |FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""".stripMargin))
  )
}
