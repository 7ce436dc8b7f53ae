package graft

/** Single-query timing harness for iteration: `runMain graft.BenchOne <name>
  * [sfDir]` warms the plan at sf0.001, then prints three timed runs at the
  * target SF. Keeps perf investigation off the full 49-query Bench loop.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.get("graft-bench-one")
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
