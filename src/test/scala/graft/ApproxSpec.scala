package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound checks for the sketch query (q_approx_sketches has no DuckDB
  * oracle — sketches are engine-specific by design, so accuracy is the
  * contract instead of equality).
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct within rsd bound; approx median within 1 quantum") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf001)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n"),
        expr("percentile(l_quantity, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q_approx_sketches")(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    approx.foreach { case (k, (n, med)) =>
      val (en, emed) = exact(k)
      assert(math.abs(n - en).toDouble / en < 0.05, s"$k: HLL off by >5%")
      assert(math.abs(med - emed) <= 1.0, s"$k: approx median off by >1")
    }
  }
}
