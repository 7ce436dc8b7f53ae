package graft.streaming

import graft.functions.NumFns.roundHalfUp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twins of the batch event operators — the reference's
  * always-on sync loop re-expressed as unbounded queries. Each transform
  * takes a streaming DataFrame (`readStream` source) and returns the
  * transformed stream; sinks/triggers are the caller's choice, so the same
  * code serves tests (MemoryStream → memory sink) and production
  * (Kafka/files → parquet).
  *
  * State stays bounded: watermarks age out window state, the sessionizer's
  * per-key state dies on gap timeout, and dedup state is scoped to the
  * watermark horizon — all prerequisites for running forever on a cluster.
  */
object StreamOps {

  /** Tumbling event-time window counts with a watermark (batch twin:
    * `Relational.q9EventWindows`).
    */
  def windowCounts(events: DataFrame, watermark: String = "1 hour", win: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      // roundHalfUp, not round(): the batch twin q9EventWindows uses the
      // engine-portable floor form, and the scaladoc'd twin equivalence
      // must hold at decimal tie points too (NumFns doc)
      .agg(count(lit(1)).as("n"), roundHalfUp(sum("value"), 2).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Exactly-once id dedup within the watermark horizon (batch twin:
    * `DedupOps.dedupExact` keyed on event_id).
    *
    * `dropDuplicatesWithinWatermark` — NOT plain `dropDuplicates` — is the
    * load-bearing choice: with the event-time column absent from the dedup
    * keys, plain `dropDuplicates` never evicts its key state and a forever-
    * running stream grows state without bound. The WithinWatermark variant
    * expires each key once the watermark passes its event time, so state
    * size tracks the watermark horizon (the documented contract above).
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming twin of `SyncOps.syncDiff`: a live stream of crawled docs
    * (id, modified) classified against the static index snapshot via a
    * stream-static left join — the always-on form of the reference's daily
    * sync. Stream-static joins need no watermark state (the static side is
    * broadcast/re-read per micro-batch); "deleted" cannot exist in stream
    * context (an absent doc never produces an event) — that classification
    * stays with the batch op.
    */
  def streamSyncDiff(crawled: DataFrame, indexed: DataFrame): DataFrame = {
    val idx = indexed.select(
      col("id"), col("modified").as("i_modified"), col("error_cnt"))
    crawled
      .join(idx, Seq("id"), "left_outer")
      .select(
        col("id"),
        when(col("i_modified").isNull, "new")
          .when(col("modified") === col("i_modified") && col("error_cnt") === 0, "unchanged")
          .otherwise("modified")
          .as("status"))
  }

  case class ErrorEvent(id: Long, ts: Timestamp)
  case class RetryState(error_cnt: Long, skip_cnt: Long, last_ms: Long)
  case class RetryAction(id: Long, action: String,
      error_cnt: Option[Long], skip_cnt: Option[Long])

  /** Always-on twin of `SyncOps.errorRetry` (d1_sync.py:83 `test_errors`):
    * per-doc error/skip counters live in keyed state instead of a persisted
    * table, advanced by each error event —
    *  - first error / under the error threshold → "retry" (cnt+1)
    *  - error budget exhausted, under the skip threshold → "skip" (skip+1)
    *  - both budgets exhausted → "reset" (state deleted, crawl from scratch)
    *  - no errors for `quietMinutes` past the watermark → "dropped" via
    *    event-time timeout (the batch op's dropped-because-absent
    *    classification — absence is not an event, so the streaming form
    *    expresses it as a timeout, same pattern as `sessionize`; an
    *    event-time timeout keeps `processAllAvailable` semantics exact in
    *    tests, where processing-time timeouts would spin batches).
    * State is bounded by live erroring docs: every terminal action removes
    * the key, and quiet keys age out on the timeout.
    */
  def errorRetryState(
      errors: Dataset[ErrorEvent],
      allowedErrorsForDoc: Int = 3,
      skipDocCnt: Int = 2,
      quietMinutes: Int = 60): Dataset[RetryAction] = {
    val quietMs = quietMinutes * 60 * 1000L
    val spark = errors.sparkSession
    import spark.implicits._

    def update(id: Long, evts: Iterator[ErrorEvent],
        state: GroupState[RetryState]): Iterator[RetryAction] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator(RetryAction(id, "dropped", None, None))
      } else {
        val out = Seq.newBuilder[RetryAction]
        var lastMs = state.getOption.map(_.last_ms).getOrElse(0L)
        evts.toSeq.sortBy(_.ts.getTime).foreach { e =>
          lastMs = math.max(lastMs, e.ts.getTime)
          state.getOption match {
            case None =>
              state.update(RetryState(1, 0, lastMs))
              out += RetryAction(id, "retry", Some(1), Some(0))
            case Some(s) if s.error_cnt < allowedErrorsForDoc =>
              state.update(RetryState(s.error_cnt + 1, s.skip_cnt, lastMs))
              out += RetryAction(id, "retry", Some(s.error_cnt + 1), Some(s.skip_cnt))
            case Some(s) if s.skip_cnt < skipDocCnt =>
              state.update(RetryState(s.error_cnt, s.skip_cnt + 1, lastMs))
              out += RetryAction(id, "skip", Some(s.error_cnt), Some(s.skip_cnt + 1))
            case Some(_) =>
              state.remove() // budgets exhausted: forget and recrawl fresh
              out += RetryAction(id, "reset", None, None)
          }
        }
        if (state.exists) state.setTimeoutTimestamp(lastMs + quietMs)
        out.result().iterator
      }
    }

    errors
      .withWatermark("ts", s"$quietMinutes minutes")
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, n_events: Long, session_start: Timestamp, session_end: Timestamp)

  /** Gap-timeout sessionization via flatMapGroupsWithState (batch twin:
    * `Relational.q10Sessionize`). A session closes when its key sees no
    * events for `gapMinutes` past the watermark; closed sessions are emitted
    * and their state dropped, so state size tracks live users only.
    */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30): Dataset[SessionOut] = {
    val gapMs = gapMinutes * 60 * 1000L
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, evts: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(userId, s.n, new Timestamp(s.start), new Timestamp(s.end)))
      } else {
        val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val closed = Seq.newBuilder[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
            case Some(s) =>
              closed += SessionOut(userId, s.n, new Timestamp(s.start), new Timestamp(s.end))
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming WARC ingest: archives land in a directory (the crawl
    * fleet's drop zone — object-store prefix in production) and each
    * micro-batch parses the NEW files to record rows with the same
    * byte-exact [[graft.functions.WarcParse]] the batch path uses. The
    * `binaryFile` streaming source tracks processed files in the
    * checkpoint, so a file is parsed exactly once; per-file parallelism is
    * unchanged from batch (the WARC size cap is the distribution unit).
    * State: none beyond the source's file log — the parse is stateless.
    */
  def streamWarc(spark: org.apache.spark.sql.SparkSession, dir: String,
      gzipped: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    val raw = spark.readStream
      .format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(dir)
      .select(col("path"), col("content"))
    val bytes =
      if (gzipped)
        GraftSqlBridge.column(graft.functions.Gunzip(
          GraftSqlBridge.expression(col("content"))))
      else col("content")
    raw
      .withColumn("rec", explode(GraftSqlBridge.column(
        graft.functions.WarcParse(GraftSqlBridge.expression(bytes)))))
      .select(col("path"), col("rec.*"))
  }
}
