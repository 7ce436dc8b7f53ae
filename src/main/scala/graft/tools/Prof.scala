package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Phase/plan profiler for optimization work: runs named registered queries
  * once for warmup, then times N repeats and prints per-query seconds plus
  * the Spark job count each run triggers (job count ≈ driver round-trips —
  * the fixed cost that dominates gate-scale corpora). Not part of the bench
  * contract; a diagnostic main only.
  *
  * Usage: runMain graft.tools.Prof <sfDir> <query>[,<query>...] [reps]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark: SparkSession = GraftSession.get("graft-prof")
    val sc = spark.sparkContext
    @volatile var jobs = 0
    val verbose = sys.env.contains("GRAFT_PROF_JOBS")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1
        val site = js.stageInfos.lastOption.map(si =>
          si.name.take(60) + " | " + si.details.linesIterator.toSeq
            .find(l => !l.contains("org.apache.spark") && !l.contains("scala."))
            .getOrElse("").trim.take(90)).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), js.stageInfos.size, site))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(starts.get(je.jobId)).foreach { case (t0, ns, site) =>
          println(f"JOB ${je.jobId}%3d stages=$ns%2d ${(System.nanoTime() - t0) / 1e3}%9.0f us  $site")
        }
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      (1 to reps).foreach { i =>
        val j0 = jobs
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val cnt = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val build = (t1 - t0) / 1e9
        val phases = df.queryExecution.tracker.phases
          .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
          .mkString(" ")
        println(f"PROF $n%-22s run$i $dt%7.3f s (build $build%6.3f)  jobs=${jobs - j0}%3d  rows=$cnt  $phases")
      }
    }
    spark.stop()
  }
}
