package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound checks for the sketch tiers. Since round 13
  * q_approx_sketches is hash-GATED (deterministic fixed-register HLL +
  * histogram median — equality vs DuckDB is the driver's job), so this
  * suite carries (a) the statistical contracts of every estimator and
  * (b) the error bounds of the ENGINE-NATIVE approx_count_distinct /
  * percentile_approx, which stay exercised here even though the
  * registered query no longer uses them.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native approx_count_distinct within rsd bound; native approx median within 1 quantum") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf001)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n"),
        expr("percentile(l_quantity, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct("l_orderkey", 0.02).as("approx_orders"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx_median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    approx.foreach { case (k, (n, med)) =>
      val (en, emed) = exact(k)
      assert(math.abs(n - en).toDouble / en < 0.05, s"$k: HLL++ off by >5%")
      assert(math.abs(med - emed) <= 1.0, s"$k: approx median off by >1")
    }
  }

  test("q_approx_sketches: gated HLL within 2.5 sigma; histogram median within 1 quantum") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf001)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n"),
        expr("percentile(l_quantity, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // schema: l_returnflag, n_zero_regs, max_rho, reg_sum, hll_est, median_qty
    val rows = SparkEntry.queries("q_approx_sketches")(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4), r.getDouble(5))).toMap
    // m=64 HLL stderr is 1.04/sqrt(64) ~ 13%; 2.5 sigma ~ 33%
    rows.foreach { case (k, (zeroRegs, est, med)) =>
      val (en, emed) = exact(k)
      assert(zeroRegs == 0L, s"$k: registers not saturated at $en distinct keys")
      assert(math.abs(est - en) / en < 0.33, s"$k: HLL est $est vs exact $en")
      assert(math.abs(med - emed) <= 1.0, s"$k: histogram median $med vs exact $emed")
    }
  }

  test("hllDistinct small-range regime: linear counting kicks in and is near-exact") {
    import spark.implicits._
    // 24 distinct keys over 64 registers: V > 0 guaranteed, raw <= 2.5m,
    // so the linear-counting branch m*ln(m/V) fires — near-exact there
    val small = (1 to 24).flatMap(i => Seq(("g", i.toLong), ("g", i.toLong)))
      .toDF("grp", "key")
    val r = graft.operators.Sketch.hllDistinct(small, "grp", col("key"))
      .collect().head
    val zeroRegs = r.getLong(1); val est = r.getDouble(4)
    assert(zeroRegs > 0L, "24 keys cannot fill 64 registers")
    assert(math.abs(est - 24.0) / 24.0 < 0.25, s"linear-counting est $est vs 24")
  }

  test("hllDistinct is partitioning-invariant (registers merge by max)") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf0001)
    val a = graft.operators.Sketch.hllDistinct(li, "l_returnflag", col("l_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val b = graft.operators.Sketch.hllDistinct(li.repartition(13), "l_returnflag", col("l_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(a == b)
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

  // ---- Count-Min sketch (text_cms_sketch / text_cms_est) ----

  private def exactTokenCounts(docs: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    import graft.functions.TextOps
    docs.select(explode(TextOps.splitWords(TextOps.normalize(col("text")))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("CMS never undercounts — one-sided error for EVERY token at colliding width") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val exact = exactTokenCounts(docs)
    // topN above the vocabulary size = every token is a probe
    val card = graft.operators.Sketch.cmsEstimates(docs, d = 4, w = 32,
      topN = exact.size + 10).collect()
    assert(card.length == exact.size)
    var over = 0
    card.foreach { r =>
      val (tok, est, ex, oc) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ex == exact(tok), s"$tok: exact side wrong")
      assert(est >= ex, s"$tok: CMS undercounted ($est < $ex)")
      assert(oc == est - ex)
      if (oc > 0) over += 1
    }
    // w=32 over this vocabulary MUST collide somewhere, or the card is
    // measuring nothing
    assert(over > 0, "no collisions at w=32 — the honesty card is vacuous")
  }

  test("CMS is exact when one hash row clears the vocabulary (w >> |V|)") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val exact = exactTokenCounts(docs)
    val card = graft.operators.Sketch.cmsEstimates(docs, d = 4, w = 1 << 14,
      topN = exact.size + 10).collect()
    card.foreach(r => assert(r.getLong(3) == 0L,
      s"${r.getString(0)}: overcount ${r.getLong(3)} at w=16384"))
  }

  test("CMS merges by addition: split-corpus sketches sum to the full sketch") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val full = cells(graft.operators.Sketch.cmsSketch(docs, 4, 32))
    val a = cells(graft.operators.Sketch.cmsSketch(docs.filter(col("doc_id") % 2 === 0), 4, 32))
    val b = cells(graft.operators.Sketch.cmsSketch(docs.filter(col("doc_id") % 2 === 1), 4, 32))
    val summed = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(summed == full)
  }
}
