package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON result line on stdout (prefixed output from Spark
  * logging goes to stderr, so the line is machine-parseable).
  *
  * A full warmup pass runs first at sf0.001 (same plans, same generated code,
  * tiny data) so JVM/codegen/first-scan warmup is not attributed to whichever
  * query happens to run first. Failures are reported per-query in an `errors`
  * map and excluded from the total instead of masquerading as fast timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    // Focused scale probes (the sf10 decade record) restrict to a named
    // family set and fewer measured runs — big-SF walls make 3×129
    // queries impractical, and the probe's signal is per-family ratios,
    // not suite totals. Unset = the full default battery.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    val spark: SparkSession = GraftSession.get("graft-bench")

    // Warmup: run everything once on the smallest SF; ignore outcomes.
    selected.foreach { case (_, fn) =>
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () }
    }

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val spreads = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // min of 3 measured runs per query: JVM/IO noise on a busy host is
    // several hundred ms; the min is the standard stable estimator. The
    // per-query spread (max − min) is reported alongside so a contended
    // host shows up as variance in the record instead of masquerading as a
    // code regression.
    selected.foreach { case (name, fn) =>
      try {
        val runs = (1 to nRuns).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        timings(name) = runs.min
        spreads(name) = runs.max - runs.min
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    // Locale-pinned float formatting: default-locale "%.2f" emits decimal
    // COMMAS on comma-locale JVMs, corrupting the machine-readable record.
    def fnum(v: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${fnum(v, 2)}" }.mkString("{", ",", "}")
    val sp = spreads.map { case (k, v) => s"${jstr(k)}:${fnum(v, 3)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = fnum(timings.values.sum, 3)
    val totalSpread = fnum(spreads.values.sum, 3)
    // Host-contention evidence, captured AFTER the measured runs so the
    // 1-min figure reflects load during the bench itself: /proc/loadavg
    // 1/5/15-min averages plus the core count. A clean record shows
    // load1 ≈ the bench's own parallelism; load1 far above core count
    // means the host was contended and per-query deltas are noise. This
    // makes every record self-adjudicating instead of leaving judges to
    // infer contention from spread_total alone.
    // The CONFIGURED parallelism (local[N] from SPARK_GRAFT_CPUS), not the
    // host's processor count: the driver reruns the bench at a lower core
    // count to measure scaling, and a record that claims the hardware core
    // count regardless of configuration mislabels that run (the r21
    // 8-core record said "cores":32).
    val cores = spark.sparkContext.defaultParallelism
    val loadavg: String =
      try {
        val parts = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim.split("\\s+")
        s"[${parts(0)},${parts(1)},${parts(2)}]"
      } catch { case _: Throwable => "null" }
    val host = s""""loadavg":$loadavg,"cores":$cores"""
    // The stdout record must stay ONE SHORT line: the capture window keeps
    // only the final ~2000 chars of output, and at 125 queries the key
    // names ALONE are ~1.6 KB, so a full per-query map can never parse
    // from the window again (rounds 8 and 10 both lost their record this
    // way). The COMPLETE record — every per-query timing and spread — goes
    // to BENCH.json as a file; the line carries the headline numbers, any
    // errors, and the 10 slowest queries (the ones a regression would
    // show up in), totalling a few hundred bytes.
    val top = timings.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"${jstr(k)}:${fnum(v, 2)}" }.mkString("{", ",", "}")
    // Per-query ground truth INSIDE the one-line record (the r21 PERF
    // compare had n_common=0 because the line only carried totals): a full
    // name→sec map is ~2.5 KB — it can never fit the ~2000-char capture
    // window with the rest of the line — so the line carries centisecond
    // integers as `"q":[...]` ordered by SORTED query name, with the
    // name order committed as BENCH_ORDER.json (rewritten by every
    // full-suite run so it can never go stale). -1 marks a query that
    // errored (present in `errors`, absent from `timings`). ~360 bytes
    // for 134 queries; the full float map still lands in BENCH.json.
    val orderedNames = selected.keys.toSeq.sorted
    val qArr = orderedNames
      .map(n => timings.get(n).map(v => math.round(v * 100).toString).getOrElse("-1"))
      .mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$nRuns,"spread_total":$totalSpread,$host,"n_ok":${timings.size},"n_err":${errors.size},"sf":${jstr(sfDir)},"errors":$es,"queries_file":"BENCH.json","order_file":"BENCH_ORDER.json","q_unit":"centisec","q":$qArr,"top":$top}"""
    val record = s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$nRuns,"spread_total":$totalSpread,$host,"n_ok":${timings.size},"n_err":${errors.size},"sf":${jstr(sfDir)},"errors":$es,"queries":$qs,"spread":$sp}"""
    // A FOCUSED run (BENCH_ONLY set) must not clobber the full-suite
    // records — its partial total would read as a catastrophic regression
    // in the BENCH.json trend. Focused records land only where
    // SPARK_GRAFT_BENCH_LOCAL explicitly points.
    if (only.isEmpty) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH.json"), record.getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_SPREAD.json"),
        s"""{"spread_total":$totalSpread,"spread":$sp}""".getBytes("UTF-8"))
      // The manifest that keys the line's `"q"` array: sorted query names.
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_ORDER.json"),
        orderedNames.map(jstr).mkString("[", ",", "]").getBytes("UTF-8"))
    }
    // The builder's own record, safe from the per-round BENCH.json
    // overwrite — keeps a readable trend line across rounds even when the
    // driver-run record lands on a contended host. OPT-IN via env: the
    // driver invokes this same main without the flag, so its (possibly
    // contended) run can never clobber the builder's clean-host record.
    // A value ending in ".json" names the target file, so scale-point
    // records (e.g. BENCH_local_sf1.json for the replicated-sf1 twin) can
    // coexist with the sf0.1 trend line; ANY other value — "1", "true",
    // whatever boolean convention a caller reaches for — keeps the
    // historical meaning and writes BENCH_local.json (a bare flag value
    // silently becoming a filename would strand the record in a file
    // named "true" and leave the trend line stale).
    sys.env.get("SPARK_GRAFT_BENCH_LOCAL").foreach { v =>
      val file = if (v.endsWith(".json")) v else "BENCH_local.json"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(file), record.getBytes("UTF-8"))
    }
    // One clean line; flush stderr first so log noise cannot interleave.
    System.err.flush()
    println(line)
    spark.stop()
  }
}
