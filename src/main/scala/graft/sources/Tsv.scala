package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Reference-format TSV sinks (SURVEY.md §2: V6/P4/I4) — byte-layout
  * golden-parity writers for interop with the original pipeline's file
  * contracts. Internal materialization uses parquet (Search.buildIndex);
  * these exist so a consumer of the reference's text outputs can read ours.
  *
  * `sorted = true` reproduces the reference's single-reducer sorted-file
  * layout (one part file, key order); leave it false at scale — the data
  * content is identical, just sharded.
  */
object Tsv {

  private def write(df: DataFrame, line: org.apache.spark.sql.Column,
                    sortCols: Seq[String], out: String, sorted: Boolean): Unit = {
    val projected = df.select((line.as("value") +: sortCols.map(col)): _*)
    val arranged =
      if (sorted) projected.orderBy(sortCols.map(col): _*).coalesce(1)
      else projected
    arranged.select("value").write.mode("overwrite").text(out)
  }

  /** `word \t "wordId df"` (Vocabulary.java:101-105). */
  def writeVocabulary(vocab: DataFrame, out: String, sorted: Boolean = false): Unit =
    write(vocab,
      concat_ws("\t", col("word"), concat_ws(" ", col("word_id"), col("df"))),
      Seq("word"), out, sorted)

  /** `docId \t wordId \t tf` (Indexer.java:110,131-137). */
  def writePostings(postings: DataFrame, out: String, sorted: Boolean = false): Unit =
    write(postings,
      concat_ws("\t", col("doc_id"), col("word_id"), col("tf")),
      Seq("doc_id", "word_id"), out, sorted)

  /** `docId \t url title` (ParseDocument.java:41-43,60-62); our metadata
    * columns stand in for url/title.
    */
  def writeDocInfo(docInfo: DataFrame, out: String, sorted: Boolean = false): Unit =
    write(docInfo,
      concat_ws("\t", col("doc_id"), concat_ws(" ", col("source"), col("lang"))),
      Seq("doc_id"), out, sorted)

  // ---- readers for the same contracts (what Indexer.java:52-66 and
  // Query.java:64-77 parse back) ----

  /** Read `word \t "wordId df"` back to (word, df, word_id). */
  def readVocabulary(spark: org.apache.spark.sql.SparkSession, in: String): DataFrame =
    spark.read.text(in)
      .select(split(col("value"), "\t").as("p"))
      .select(col("p").getItem(0).as("word"),
        split(col("p").getItem(1), " ").as("q"))
      .select(col("word"),
        col("q").getItem(1).cast("long").as("df"),
        col("q").getItem(0).cast("long").as("word_id"))

  /** Read `docId \t wordId \t tf` back to (doc_id, word_id, tf). */
  def readPostings(spark: org.apache.spark.sql.SparkSession, in: String): DataFrame =
    spark.read.option("sep", "\t")
      .schema("doc_id LONG, word_id LONG, tf LONG").csv(in)
}
