package graft

/** Debug helper: print a registered query's optimized logical plan
  * (`runMain graft.PlanDump <query>`) — the fast way to audit plan shape
  * without spinning up the test harness.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("plan-dump")
    val qe = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001").queryExecution
    if (args.length > 1 && args(1) == "physical") println(qe.executedPlan.treeString)
    else println(qe.optimizedPlan.treeString)
    spark.stop()
  }
}
