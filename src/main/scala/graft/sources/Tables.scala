package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test tables (TESTDATA.md)
  * plus the reference's JSON-lines corpus contract.
  */
object Tables {

  /** Parquet schema per path, inferred once: Spark runs a footer-reading
    * job for every schemaless `read.parquet`, so a session that builds
    * many plans over the same tables pays one job per PLAN BUILD. The
    * schemas are a fixed contract per SF dir — cache them so every load
    * after the first is job-free (and plan construction is fully lazy).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Load one of the star-schema / text / vector / stream tables. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sch = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(path)
  }

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
    StructField("id", StringType), // WikiExtractor quotes ids ("id": "12") — read as string, cast below (Vocabulary.java:38's Integer.parseInt)
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("text", StringType)))

  /** Reference corpus reader: JSON-lines restricted to the `AA*` shard glob
    * (Vocabulary.java:25,143). One schema'd scan with column pruning replaces
    * the reference's three full-corpus passes (SURVEY.md §3.1). The glob is
    * applied via `pathGlobFilter` (filename-level pruning at listing time —
    * the same file-level partition filter the reference hard-codes) rather
    * than a glob-in-path, which Spark 4's source resolution rejects.
    */
  def corpusJson(spark: SparkSession, dir: String, glob: String = "AA*"): DataFrame =
    spark.read.schema(corpusSchema).option("pathGlobFilter", glob)
      .option("mode", "DROPMALFORMED") // reference crashes on bad lines (uncaught JSONException, Vocabulary.java:35); drop instead of emitting all-NULL rows
      .json(dir)
      .withColumn("id", col("id").cast(LongType))
}
