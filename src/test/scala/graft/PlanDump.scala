package graft

/** Dev tool: print a registered query's plan — static formatted explain,
  * or (with a second arg `exec`) the final adaptive plan after execution,
  * which is where AQE-applied shapes like ReusedExchange show up.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val df = SparkEntry.queries(args(0))(spark, TestSpark.sf001)
    if (args.length > 1 && args(1) == "exec") {
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    } else
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
