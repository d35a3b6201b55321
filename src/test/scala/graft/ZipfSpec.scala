package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decision-level coverage for the Zipf-slope fit: the decomposed
  * dense-rank must equal the naive single-partition window formulation
  * exactly (that equality is what lets the oracle use the naive form),
  * and the OLS arithmetic must recover a known slope on a synthetic
  * exact-power-law corpus.
  */
class ZipfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A corpus whose term frequencies are an exact power law: word w_r
    * appears ceil(1000 / r^s) times, r = 1..40, one source. */
  private def powerCorpus(s: Double) = {
    val words = (1 to 40).map(r => (f"w$r%03d", math.ceil(1000.0 / math.pow(r, s)).toInt))
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    Seq((0L, text, "en", "web", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("zipf slope: decomposed rank equals the single-window rank") {
    // two sources, colliding frequencies, words spread across first chars
    val docs = Seq(
      (0L, "apple apple apple bear bear cat dog dog dog dog zebra", "en", "web"),
      (1L, "apple bear bear bear cat cat yak yak zebra zebra zebra", "en", "web"),
      (2L, "mouse mouse mouse mouse newt newt otter", "en", "book"),
      (3L, "newt otter otter mouse", "en", "book"))
      .map { case (i, t, l, s) => (i, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tf = docs
      .select(col("source"),
        explode(graft.functions.TextOps.splitWords(
          graft.functions.TextOps.normalize(col("text")))).as("word"))
      .filter(graft.functions.TextOps.isKeptToken(col("word")))
      .groupBy("source", "word").agg(count(lit(1)).as("freq"))
    val naive = tf.withColumn("rank",
      row_number().over(Window.partitionBy("source").orderBy(desc("freq"), asc("word"))))
      .select("source", "word", "rank")
      .as[(String, String, Int)].collect().toSet
    // re-derive the decomposed ranks the operator uses
    val withPfx = tf.withColumn("pfx", substring(col("word"), 1, 1))
    val offsets = withPfx.groupBy("source", "freq", "pfx").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(
        sum("n").over(Window.partitionBy("source").orderBy(desc("freq"), asc("pfx"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "freq", "pfx", "off")
    val decomposed = withPfx.join(offsets, Seq("source", "freq", "pfx"))
      .withColumn("rank", (col("off") + row_number().over(
        Window.partitionBy("source", "freq", "pfx").orderBy("word"))).cast("int"))
      .select("source", "word", "rank")
      .as[(String, String, Int)].collect().toSet
    assert(decomposed == naive)
  }

  test("zipf slope: recovers the planted exponent on an exact power law") {
    for (s <- Seq(0.8, 1.0, 1.3)) {
      val r = graft.operators.TextAnalysis.zipfSlope(powerCorpus(s))
        .as[(String, Long, Double, Double)].collect()
      assert(r.length == 1 && r(0)._2 == 40L)
      // ceil() quantization biases the tail up a little; ±0.08 is ample
      assert(math.abs(r(0)._3 - (-s)) < 0.08,
        s"slope ${r(0)._3} should be ≈ ${-s}")
    }
  }

  test("zipf slope: plain-Scala OLS differential on a mixed corpus") {
    val docs = powerCorpus(1.0)
    val got = graft.operators.TextAnalysis.zipfSlope(docs)
      .as[(String, Long, Double, Double)].collect()(0)
    // independent reference: same stab discipline in plain Scala
    def stab6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val freqs = (1 to 40).map(r => math.ceil(1000.0 / r).toLong).sorted.reverse
    val pts = freqs.zipWithIndex.map { case (f, i) =>
      (stab6(math.log(i + 1.0)), stab6(math.log(f.toDouble))) }
    val pxy = pts.map { case (x, y) => BigDecimal(stab6(x * y)) }.sum.toDouble
    val pxx = pts.map { case (x, _) => BigDecimal(stab6(x * x)) }.sum.toDouble
    val sx = pts.map(p => BigDecimal(p._1)).sum.toDouble
    val sy = pts.map(p => BigDecimal(p._2)).sum.toDouble
    val n = pts.length
    val slope = (n * pxy - sx * sy) / (n * pxx - sx * sx)
    assert(got._3 == stab6(slope))
    assert(got._4 == stab6((sy - slope * sx) / n))
  }
}
