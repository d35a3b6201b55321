package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test tables (TESTDATA.md)
  * plus the reference's JSON-lines corpus contract.
  */
object Tables {

  /** Load one of the star-schema / text / vector / stream tables. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects. Read nanos as long (legacy conf) and truncate to microsecond
    * timestamps — the same truncation DuckDB applies when casting its
    * TIMESTAMP_NS to TIMESTAMP, so oracles stay value-identical (the oracle
    * SQL casts correspondingly; see EventQueries.evCte).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Schema of the reference's WikiExtractor JSON-lines corpus
    * (Vocabulary.java:35-39; FIXTURES.md §A). Explicit — the fields are a
    * fixed contract, inference would cost an extra pass over 100 TB.
    */
  val corpusSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("text", StringType)))

  /** Reference corpus reader: JSON-lines restricted to the `AA*` shard glob
    * (Vocabulary.java:25,143). One schema'd scan with column pruning replaces
    * the reference's three full-corpus passes (SURVEY.md §3.1).
    */
  def corpusJson(spark: SparkSession, dir: String, glob: String = "AA*"): DataFrame =
    spark.read.schema(corpusSchema).json(s"$dir/$glob")
}
