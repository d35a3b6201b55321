package graft

import org.scalatest.funsuite.AnyFunSuite

/** array_dot registered through SparkSessionExtensions (GraftExtensions)
  * is a first-class SQL function with codegen.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("array_dot is SQL-callable via GraftExtensions") {
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("array_dot null array -> null; wrong type -> analysis error") {
    val n = spark.sql(
      "SELECT array_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d").head()
    assert(n.isNullAt(0))
    val e = intercept[Exception] {
      spark.sql("SELECT array_dot(array('a'), array('b'))").head()
    }
    assert(e.getMessage.toLowerCase.contains("array_dot"))
  }
}
