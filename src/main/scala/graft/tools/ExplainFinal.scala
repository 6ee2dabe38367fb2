package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (r16): print the FINAL adaptive physical plan of registered
  * queries — the post-execution plan with AQE's runtime decisions
  * (ReusedExchange / reused shuffle stages, AQEShuffleRead coalescing,
  * runtime join swaps) that the static Explain tool cannot show.
  * Executes each query through the noop sink first, then prints the
  * executed plan: `runMain graft.tools.ExplainFinal <name> [name ...]`.
  */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"\n================ $name ================")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // execute THIS plan instance (a .write would clone the query
      // execution and leave this AdaptiveSparkPlan unfinalized), then
      // print it — now carrying AQE's runtime decisions
      val plan = df.queryExecution.executedPlan
      plan.execute().count()
      println(plan.toString)
    }
    spark.stop()
  }
}
