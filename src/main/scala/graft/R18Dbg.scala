package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan-inspection main for the round-18 loop tightening: prints
  * the executed plan of one label-propagation round so the exchange-free
  * claim is checked against the real physical plan, not intuition.
  */
object R18Dbg {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.documents(spark, d)
    val e = graft.operators.Graph.blockEdges(docs)
    val und = e.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val nbrsC = und.select(col("a").as("v"), col("b").as("u"))
      .union(und.select(col("b").as("v"), col("a").as("u")))
      .localCheckpoint()
    println(s"nbrs partitions: ${nbrsC.rdd.getNumPartitions}")
    val nbrs = nbrsC.coalesce(1)
    val lab = docs.select(col("doc_id").as("v"))
      .select(col("v"), col("v").as("lab")).localCheckpoint().coalesce(1)
    val cnt = nbrs.join(
        lab.withColumnRenamed("v", "u").withColumnRenamed("lab", "ulab")
          .hint("shuffle_hash"), "u")
      .groupBy(col("v"), col("ulab")).agg(count(lit(1)).as("c"))
    val pick = cnt.groupBy("v")
      .agg(min(struct((-col("c")).as("nc"), col("ulab").as("l"))).as("m"))
      .select(col("v"), col("m.l").as("plab"))
    for (variant <- Seq("shuffle_hash", "co_sh", "co_none")) {
      val pk = variant match {
        case "shuffle_hash" => pick.hint(variant)
        case "co_sh" => pick.coalesce(1).hint("shuffle_hash")
        case _ => pick.coalesce(1)
      }
      val next = lab.join(pk, Seq("v"), "left")
        .select(col("v"), coalesce(col("plab"), col("lab")).as("lab"))
      next.count()
      println(s"=== variant $variant ===")
      println(next.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple")))
    }
    spark.stop()
  }
}
