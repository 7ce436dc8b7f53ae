package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Streaming throughput standing record: drives the four always-on
  * operators (`StreamOps.windowCounts`, `StreamOps.dedupEvents`, and the
  * flatMapGroupsWithState pair `sessionize` / `errorRetryState`) through a
  * real file-drop pipeline — parquet files landing in a watched directory,
  * exactly the reference's "crawler output appears, the always-on loop
  * picks it up" shape — and writes STREAM.json (plus the same line on
  * stdout) so sustained rows/s and per-batch latency trend across rounds
  * the way RECALL.json / SKEW.json trend recall and skew resilience.
  *
  * Method: the sf events table is replicated ×`amplify` (disjoint
  * event_id ranges, same timestamps — concurrent streams, not a longer
  * one), split into `nBatches` TIME-ORDERED drops (equal event-time
  * slices — the way an always-on source actually arrives, so the
  * watermark advances with every drop), staged to a holding area once,
  * then COPIED into each
  * query's watched dir drop by drop with `processAllAvailable()` timed per
  * drop. The two queries run sequentially over identical drops so each
  * gets a clean wall (concurrent queries would contend on local[32] and
  * blur both numbers). The dedup input additionally carries ~20% injected
  * duplicate rows (same event_id, same ts) that
  * `dropDuplicatesWithinWatermark` must absorb — the output row count
  * proves it did (exactly-once per event_id at the sink).
  *
  * What the numbers mean at scale: both queries are single-shuffle
  * streaming plans (windowCounts: partial agg → window-keyed state;
  * dedupEvents: event_id-keyed state within the watermark horizon), so
  * rows/s here is the per-core state-machine cost — the number to divide
  * into a cluster's core count — and batch_ms tracks micro-batch overhead
  * (file listing + planning + state store commit), the floor on achievable
  * trigger latency.
  */
object StreamBench {
  private case class RunStats(
      inputRows: Long, outputRows: Long, wallS: Double,
      batchMs: Seq[Double], stateRowsMax: Long, stateMemMaxBytes: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val nBatches = sys.env.get("SPARK_GRAFT_STREAM_BATCHES").map(_.toInt).getOrElse(8)
    val amplify = sys.env.get("SPARK_GRAFT_STREAM_AMPLIFY").map(_.toInt).getOrElse(10)
    val spark: SparkSession = GraftSession.get("graft-stream-bench")

    val root = Files.createTempDirectory("graft_stream_bench")
    def dir(parts: String*): Path = {
      val p = parts.foldLeft(root)(_.resolve(_))
      Files.createDirectories(p); p
    }

    // ---- stage the drops once --------------------------------------
    val events = Tables.events(spark, sfDir)
    val replicated = events
      .crossJoin(broadcast(spark.range(amplify).toDF("rep")))
      .withColumn("event_id", col("event_id") + col("rep") * lit(1000000000L))
      .drop("rep")
    // drops are EQUAL-TIME slices (floor over the ts span — a projection,
    // no global window): drop i is the stream's i-th time interval, so
    // row counts per drop follow the event-time distribution, exactly how
    // an always-on source arrives
    val Array(mnRow) = replicated
      .agg(min(unix_micros(col("ts"))).as("mn"), max(unix_micros(col("ts"))).as("mx"))
      .collect()
    val (mn, mx) = (mnRow.getLong(0), mnRow.getLong(1))
    val sliceUs = (mx - mn) / nBatches + 1
    val staged = replicated
      .withColumn("b", least(lit(nBatches - 1),
        ((unix_micros(col("ts")) - lit(mn)) / lit(sliceUs)).cast("int")))
      .persist()
    val holding = dir("holding")
    (0 until nBatches).foreach { i =>
      val batch = staged.filter(col("b") === i).drop("b")
      // ~20% duplicate rows, injected mid-batch: same event_id + ts, so
      // the dedup query must drop them within the watermark horizon
      batch.union(batch.filter(col("event_id") % 5 === 0))
        .coalesce(2)
        .write.mode("overwrite").parquet(holding.resolve(i.toString).toString)
    }
    val inputSchema = spark.read.parquet(holding.resolve("0").toString).schema
    val totalInput = staged.count() // unique rows; dups on top per drop
    staged.unpersist(false)

    // Copy to a dot-prefixed temp name first, then an atomic same-fs
    // rename: the streaming query is LIVE while drops land, and
    // FileStreamSource can list (and fail on) a half-copied parquet file
    // with no footer; hidden dot-files are ignored by the file source, so
    // the file only becomes visible complete.
    def dropFiles(from: Path, to: Path): Unit =
      Files.list(from).iterator().forEachRemaining { f =>
        if (f.getFileName.toString.endsWith(".parquet")) {
          val tmp = to.resolve("." + f.getFileName.toString + ".tmp")
          Files.copy(f, tmp, StandardCopyOption.REPLACE_EXISTING)
          Files.move(tmp, to.resolve(f.getFileName),
            StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
        }
      }

    // ---- drive one query over the drops ----------------------------
    def run(name: String, mkQuery: (DataFrame, String, String) => StreamingQuery): RunStats = {
      val src = dir(name, "in")
      val out = dir(name, "out").toString
      val chk = dir(name, "chk").toString
      val stream = spark.readStream.schema(inputSchema).parquet(src.toString)
      val q = mkQuery(stream, out, chk)
      var wall = 0.0
      val batchMs = Seq.newBuilder[Double]
      (0 until nBatches).foreach { i =>
        dropFiles(holding.resolve(i.toString), src)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        wall += (System.nanoTime() - t0) / 1e9
      }
      val progress = q.recentProgress.toSeq
      q.stop()
      val inRows = progress.map(_.numInputRows).sum
      progress.filter(_.numInputRows > 0).foreach { p =>
        batchMs += p.durationMs.get("triggerExecution").toDouble
      }
      // state-store footprint across the run: the number the stateful
      // operators' "bounded state" claims rest on (watermark eviction /
      // session close / terminal-action removal must keep it flat-ish,
      // not corpus-sized)
      val stateRows = progress.flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
      val stateMem = progress.flatMap(_.stateOperators.toSeq.map(_.memoryUsedBytes))
      val outRows = spark.read.parquet(out).count()
      RunStats(inRows, outRows, wall, batchMs.result(),
        if (stateRows.isEmpty) 0L else stateRows.max,
        if (stateMem.isEmpty) 0L else stateMem.max)
    }

    // windowCounts: append mode — a window emits once the watermark
    // passes it, the production file-sink contract (the final window
    // stays in state; its processing cost is still paid and timed)
    val wc = run("window_counts", (s, out, chk) =>
      streaming.StreamOps.windowCounts(s, watermark = "30 minutes")
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", out).option("checkpointLocation", chk)
        .start())

    val dd = run("dedup", (s, out, chk) =>
      streaming.StreamOps.dedupEvents(s, watermark = "30 minutes")
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", out).option("checkpointLocation", chk)
        .start())

    // The flatMapGroupsWithState pair — the ops whose keyed state store
    // actually strains at volume (windowCounts/dedup state is
    // operator-managed; these two manage their own per-key state +
    // event-time timeouts). Sessions close on the 30-min gap as the
    // time-ordered drops advance the watermark; error retries key on
    // user_id so keys RECUR across drops and the counter state machine
    // exercises updates, not just inserts.
    val ss = run("sessionize", (s, out, chk) => {
      import spark.implicits._
      streaming.StreamOps.sessionize(
        s.select(col("user_id"), col("event_id"), col("ts"))
          .as[streaming.StreamOps.SessionEvent], gapMinutes = 30)
        .toDF()
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", out).option("checkpointLocation", chk)
        .start()
    })

    val er = run("error_retry", (s, out, chk) => {
      import spark.implicits._
      streaming.StreamOps.errorRetryState(
        s.select(col("user_id").as("id"), col("ts"))
          .as[streaming.StreamOps.ErrorEvent], quietMinutes = 60)
        .toDF()
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", out).option("checkpointLocation", chk)
        .start()
    })
    require(ss.outputRows > 0, "sessionize emitted no closed sessions")
    require(er.outputRows > 0, "error_retry emitted no actions")

    // exactly-once check: every injected duplicate absorbed, every
    // unique event delivered once
    require(dd.outputRows == totalInput,
      s"dedup output ${dd.outputRows} != unique input $totalInput")
    require(dd.inputRows > totalInput,
      "dedup input carried no injected duplicates — staging bug")

    def fnum(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    def stats(name: String, r: RunStats): String = {
      val mean = if (r.batchMs.isEmpty) 0.0 else r.batchMs.sum / r.batchMs.size
      val max = if (r.batchMs.isEmpty) 0.0 else r.batchMs.max
      s""""$name":{"input_rows":${r.inputRows},"output_rows":${r.outputRows},""" +
      s""""wall_s":${fnum(r.wallS)},"rows_per_s":${fnum(r.inputRows / r.wallS)},""" +
      s""""batch_ms_mean":${fnum(mean)},"batch_ms_max":${fnum(max)},""" +
      s""""state_rows_max":${r.stateRowsMax},"state_mem_max_bytes":${r.stateMemMaxBytes},""" +
      s""""n_nonempty_batches":${r.batchMs.size}}"""
    }
    val record =
      s"""{"sf":"$sfDir","n_drops":$nBatches,"amplify":$amplify,""" +
      s""""unique_events":$totalInput,""" +
      stats("stream_window_counts", wc) + "," + stats("stream_dedup", dd) + "," +
      stats("stream_sessionize", ss) + "," + stats("stream_error_retry", er) +
      s""","dedup_exactly_once":true}"""
    java.nio.file.Files.write(
      Paths.get(sys.env.getOrElse("GRAFT_STREAM_OUT", "STREAM.json")),
      record.getBytes("UTF-8"))
    println(record)
    spark.stop()
  }
}
