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

  // KMV distinct (q_kmv_distinct) — the hash-GATED sketch tier. Equality
  // vs DuckDB is the driver's job; here the statistical contract: the
  // estimator's relative error is within the standard KMV bound
  // (~2/sqrt(k) ≈ 25% at k=64 with high probability).
  test("kmv estimate within 2/sqrt(k) of exact distinct") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf001)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kmv = graft.operators.Sketch.kmvDistinct(li, "l_returnflag", col("l_orderkey"), 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    kmv.foreach { case (k, (nKept, est)) =>
      val en = exact(k)
      assert(nKept == 64L, s"$k: sketch not full at ${en} distinct keys")
      assert(math.abs(est - en) / en < 2.0 / math.sqrt(64), s"$k: KMV est $est vs exact $en")
    }
  }

  test("kmv exhausted group returns the exact count") {
    import spark.implicits._
    val small = (1 to 10).map(i => ("g", i.toLong)).toDF("grp", "key")
    val r = graft.operators.Sketch.kmvDistinct(small, "grp", col("key"), 64)
      .collect().head
    assert(r.getLong(1) == 10L && r.getDouble(3) == 10.0)
  }

  test("kmv sketch is partitioning-invariant") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf0001)
    val a = graft.operators.Sketch.kmvDistinct(li, "l_returnflag", col("l_orderkey"), 64)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    val b = graft.operators.Sketch.kmvDistinct(li.repartition(13), "l_returnflag", col("l_orderkey"), 64)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(a == b)
  }
}
