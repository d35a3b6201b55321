package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression lock on the round-9 masking bug: a registered query that
  * THROWS during the correctness dump must leave a durable record — an
  * error entry in the returned map AND in verify_errors.json — and must
  * not leave a result parquet that the driver could mistake for a
  * passing dump. Round 9 shipped two broken event queries that simply
  * vanished from the correctness ledger; the fix (Verify.scala's error
  * collection) gets its own canary here so it can never silently
  * regress.
  */
class VerifyLedgerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a throwing query lands in verify_errors.json, not in the results") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("verify-ledger").toString
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "canary_ok" -> ((s, _) => { import s.implicits._; Seq((1L, "a")).toDF("id", "v") }),
      // throws at PLAN time (analysis) — the round-9 breakage class
      "canary_plan_throws" -> ((s, _) => { import s.implicits._
        Seq((1L, "a")).toDF("id", "v").select(org.apache.spark.sql.functions.col("no_such_column")) }),
      // throws at RUN time (execution), with a quote+newline in the
      // message to exercise the JSON escaping the driver's json.load needs
      "canary_run_throws" -> ((s, _) => { import s.implicits._
        val boom = org.apache.spark.sql.functions.udf { (_: Long) =>
          throw new RuntimeException("boom \"quoted\"\nline2"); false
        }
        Seq(1L).toDF("id")
          .filter(boom(org.apache.spark.sql.functions.col("id"))) }))
    val errors = Verify.run(spark, queries, Map("canary_ok" -> "SELECT 1"),
      TestSpark.sf0001, outDir)

    assert(errors.keySet == Set("canary_plan_throws", "canary_run_throws"))
    // the good query dumped; the throwing ones left no readable parquet
    assert(new java.io.File(s"$outDir/canary_ok/_SUCCESS").exists())
    assert(!new java.io.File(s"$outDir/canary_plan_throws/_SUCCESS").exists())
    assert(!new java.io.File(s"$outDir/canary_run_throws/_SUCCESS").exists())

    // the durable ledger parses as JSON and names both failures — this is
    // the exact file the driver reads; a regression that stops writing it
    // (or writes unparseable JSON — the run-time canary's message embeds
    // a quote and a newline on purpose) fails here. Parsed with Spark's
    // strict JSON reader: a malformed document yields a corrupt-record
    // column instead of the two fields.
    val errJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/verify_errors.json"))
    val parsed = spark.read
      .option("mode", "FAILFAST").json(Seq(errJson).toDS())
    assert(parsed.schema.fieldNames.toSet ==
      Set("canary_plan_throws", "canary_run_throws"),
      s"verify_errors.json fields: ${parsed.schema.fieldNames.mkString(",")}")
    val row = parsed.collect()(0)
    assert(row.getString(row.fieldIndex("canary_plan_throws")).nonEmpty)
    // oracle_sql.json rode along as usual
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json")).contains("canary_ok"))
  }
}
