package graft

import graft.operators.Search
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet + JSON-lines + text/TSV:
  * ORC and headered CSV round-trips through the built-in readers.
  */
class IoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("vocabulary round-trips through ORC and CSV byte-identically") {
    val vocab = Search.vocabulary(Tables.documents(spark, TestSpark.sf0001))
    val want = vocab.orderBy("word").collect().map(_.toString).toSeq
    val dir = java.nio.file.Files.createTempDirectory("io").toString

    vocab.write.mode("overwrite").orc(s"$dir/orc")
    val orc = spark.read.orc(s"$dir/orc")
    // ORC read-back relaxes nullability; names+types must survive exactly
    assert(orc.schema.map(f => (f.name, f.dataType)) ==
      vocab.schema.map(f => (f.name, f.dataType)))
    assert(orc.orderBy("word").collect().map(_.toString).toSeq == want)

    vocab.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val csv = spark.read.option("header", "true")
      .schema(vocab.schema).csv(s"$dir/csv")
    assert(csv.orderBy("word").collect().map(_.toString).toSeq == want)
  }
}
