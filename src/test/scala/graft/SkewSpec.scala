package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("twoPhaseSum equals plain groupBy") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 3, i.toLong, i)).toDF("k", "v", "id")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").as[(Int, Long, Long)].collect().toSeq
    val salted = Skew.twoPhaseSum(df, Seq("k"), 8,
        Seq("n" -> count(lit(1)), "s" -> sum(col("v"))), Seq(col("id")))
      .orderBy("k").as[(Int, Long, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin row-identical to plain join; salt splits the hot key") {
    import spark.implicits._
    val big = (1 to 500).map(i => (1L, i)).toDF("k", "id") // one hot key
    val small = Seq((1L, "x")).toDF("k", "tag")
    val plainN = big.join(small, "k").count()
    val salted = Skew.saltedJoin(big, small, "k", 8, Seq(col("id")))
    assert(salted.count() == plainN)
    // the deterministic salt actually spreads the hot key over >1 bucket
    val nSalts = big.select(Skew.saltCol(8, col("id")).as("s"))
      .distinct().count()
    assert(nSalts > 1)
  }
}
