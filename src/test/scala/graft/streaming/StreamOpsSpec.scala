package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  test("stream_window_counts: tumbling windows aggregate within event-time hours") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.windowCounts(src.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      src.addData((ts(0), "view", 1.0), (ts(10), "view", 2.0), (ts(70), "click", 5.0))
      q.processAllAvailable()
      val got = spark.table("wc")
        .select("event_type", "n", "total").orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq === Seq(("click", 1L, 5.0), ("view", 2L, 3.0)))
    } finally q.stop()
  }

  test("stream_window_counts equals the batch twin on the same rows, decimal ties included") {
    // The scaladoc'd twin contract, asserted: the SAME events through
    // StreamOps.windowCounts and Relational.eventWindows must agree
    // row-for-row. 1.005 is the load-bearing value: its double is
    // 1.00499999…88, and ×100 stays below 100.5, so the shared
    // roundHalfUp floor form says 1.00 while Spark's round()
    // (shortest-decimal HALF_UP) says 1.01 — before the parity fix the
    // stream side used round() and this window diverged from batch.
    // (Not every printed tie splits: 2.675×100 re-rounds to exactly
    // 267.5 in binary, so both semantics agree there.)
    implicit val sq = spark.sqlContext
    val rows = Seq(
      (ts(0), "view", 1.005), // decimal-tie sum, alone in its window
      (ts(61), "view", 1.0), (ts(62), "view", 1.5375), (ts(63), "view", 1.1375),
      (ts(70), "click", -0.00003)) // negative-zero class through the agg
    val src = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.windowCounts(src.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("wcp").outputMode("complete").start()
    try {
      src.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("wcp")
        .select(col("window_start").cast("string"), col("event_type"), col("n"), col("total"))
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val batch = graft.operators.Relational.eventWindows(
          rows.toDF("ts", "event_type", "value"))
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(stream.toSeq == batch.toSeq,
        s"stream/batch twin divergence:\n  stream=${stream.toSeq}\n  batch=${batch.toSeq}")
      assert(stream.exists(_._4 == 1.0),
        "the tie value must round DOWN (floor form); round() would say 1.01")
    } finally q.stop()
  }

  test("stream_window_counts: a window closes in append mode only once the watermark passes it") {
    // the late-data boundary: in append mode a window's row is emitted
    // exactly when the watermark (max event time − horizon) moves past the
    // window end — and data older than the watermark no longer lands
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.windowCounts(src.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("wcb").outputMode("append").start()
    try {
      src.addData((ts(0), "view", 1.0), (ts(10), "view", 2.0))
      q.processAllAvailable()
      // watermark = ts(10) − 1h < window end ts(60): nothing emits yet
      assert(spark.table("wcb").count() == 0L)
      // advance event time far enough that the first window's end + the
      // 1h horizon is passed → exactly that window emits, with BOTH rows
      src.addData((ts(130), "view", 4.0))
      q.processAllAvailable()
      val got = spark.table("wcb")
        .select("n", "total").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.toSeq == Seq((2L, 3.0)),
        s"first window must close with both pre-watermark rows: ${got.toSeq}")
    } finally q.stop()
  }

  test("stream_dedup: duplicate event ids within the watermark are dropped") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.dedupEvents(src.toDF().toDF("event_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      src.addData((1L, ts(0), "view"), (2L, ts(1), "view"))
      q.processAllAvailable()
      src.addData((1L, ts(2), "view"), (3L, ts(3), "click")) // 1 is a dup
      q.processAllAvailable()
      val ids = spark.table("dd").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream_dedup: key state is evicted past the watermark (bounded state)") {
    // The forever-running contract: an id whose event time has aged past the
    // watermark must have its dedup state dropped — re-arrival is then
    // emitted AGAIN. Plain dropDuplicates (no WithinWatermark) fails this:
    // its state never evicts and the id would stay suppressed forever.
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.dedupEvents(src.toDF().toDF("event_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("ddev").outputMode("append").start()
    try {
      src.addData((1L, ts(0), "view"))
      q.processAllAvailable()
      src.addData((99L, ts(120), "view")) // watermark -> ts(60), past id 1's ts(0)
      q.processAllAvailable()
      src.addData((1L, ts(125), "view")) // state evicted -> NOT a duplicate
      q.processAllAvailable()
      val ones = spark.table("ddev").filter(col("event_id") === 1L).count()
      assert(ones === 2L, "event id must re-emit after its dedup state ages out")
    } finally q.stop()
  }

  test("stream_dedup state survives a checkpoint restart (exactly-once across stop/start)") {
    // The 100 TB always-on contract: a sync loop that dies mid-stream must
    // resume from its checkpoint with (a) committed batches NOT re-emitted
    // and (b) the dedup key state RESTORED — a duplicate arriving after the
    // restart is still suppressed. MemoryStream is replayable from the
    // checkpointed offsets, so this is the real recovery path, not a mock.
    // The memory sink refuses checkpoint recovery, so the output goes to
    // the FILE sink — whose commit log is itself the exactly-once
    // mechanism a production run relies on.
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ddckpt").toString
    val out = java.nio.file.Files.createTempDirectory("ddout").toString
    val src = MemoryStream[(Long, Timestamp, String)]
    def start() =
      StreamOps.dedupEvents(src.toDF().toDF("event_id", "ts", "event_type"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try {
      src.addData((1L, ts(0), "view"), (2L, ts(1), "view"))
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() === 2)
    } finally q1.stop()
    // batch 2 lands while the query is DOWN; the restarted query picks it
    // up from the recovered offsets
    src.addData((1L, ts(2), "view"), (3L, ts(3), "click"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val ids = spark.read.parquet(out).select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L),
        "restart must suppress the pre-restart duplicate (restored state) " +
          "and must not re-emit committed batch 1")
    } finally q2.stop()
  }

  test("stream_error_retry keyed state survives a checkpoint restart") {
    // Same recovery contract for the hand-rolled flatMapGroupsWithState
    // machine: after two errors (budget spent) the query stops; the error
    // arriving after restart must continue at skip(2,1). A query that lost
    // its state would restart the cycle at retry(1,0).
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("errckpt").toString
    val out = java.nio.file.Files.createTempDirectory("errout").toString
    val src = MemoryStream[StreamOps.ErrorEvent]
    def start() =
      StreamOps.errorRetryState(src.toDS(), allowedErrorsForDoc = 2, skipDocCnt = 1)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    def actions() = spark.read.parquet(out)
      .select("action", "error_cnt", "skip_cnt").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
      .sortBy(t => (t._2.map(_.asInstanceOf[Long]), t._3.map(_.asInstanceOf[Long])))
    val q1 = start()
    try {
      src.addData(StreamOps.ErrorEvent(1L, ts(1)))
      q1.processAllAvailable()
      src.addData(StreamOps.ErrorEvent(1L, ts(2)))
      q1.processAllAvailable()
      assert(actions().toSeq === Seq(
        ("retry", Some(1L), Some(0L)), ("retry", Some(2L), Some(0L))))
    } finally q1.stop()
    src.addData(StreamOps.ErrorEvent(1L, ts(3)))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(actions().toSeq === Seq(
        ("retry", Some(1L), Some(0L)), ("retry", Some(2L), Some(0L)),
        ("skip", Some(2L), Some(1L))),
        "restored state must continue at the spent error budget — a lost " +
          "state would restart the cycle at retry(1,0)")
    } finally q2.stop()
  }

  test("streamSyncDiff classifies a live crawl stream against the static index") {
    implicit val sq = spark.sqlContext
    val indexed = Seq(
      (1L, ts(0), 0), // unchanged if re-crawled with same ts
      (2L, ts(0), 0), // modified if re-crawled with newer ts
      (3L, ts(0), 1) // had errors -> always modified
    ).toDF("id", "modified", "error_cnt")
    val src = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.streamSyncDiff(src.toDF().toDF("id", "modified"), indexed)
      .writeStream.format("memory").queryName("ssd").outputMode("append").start()
    try {
      src.addData((1L, ts(0)), (2L, ts(5)), (3L, ts(0)), (9L, ts(1)))
      q.processAllAvailable()
      val got = spark.table("ssd").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "unchanged", 2L -> "modified", 3L -> "modified", 9L -> "new"))
    } finally q.stop()
  }

  test("streaming results hand off to EsBulkSink via foreachBatch") {
    implicit val sq = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("streambulk").toString
    val src = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.windowCounts(src.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val bulk = batch.select(
          concat(lit("""{"index":{"_index":"counts","_id":""""),
            col("event_type"), lit("\"}}")).as("action"),
          concat(lit("""{"n":"""), col("n"), lit("}")).as("source"))
        graft.sources.EsBulkSink.write(bulk, s"$out/batch_$id")
        ()
      }
      .start()
    try {
      src.addData((ts(0), "view", 1.0), (ts(5), "click", 2.0))
      q.processAllAvailable()
      val lines = spark.read.text(s"$out/batch_*").collect().map(_.getString(0))
      assert(lines.count(_.startsWith("{\"index\"")) === 2)
      assert(lines.length === 4)
    } finally q.stop()
  }

  test("stream_error_retry walks the reference threshold state machine per key") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[StreamOps.ErrorEvent]
    val q = StreamOps.errorRetryState(src.toDS(), allowedErrorsForDoc = 2, skipDocCnt = 1)
      .writeStream.format("memory").queryName("err").outputMode("append").start()
    try {
      // five consecutive errors for doc 1: retry(1,0), retry(2,0) — error
      // budget spent — skip(2,1) — skip budget spent — reset (state gone) —
      // then the cycle restarts at retry(1,0).
      (1 to 5).foreach { i =>
        src.addData(StreamOps.ErrorEvent(1L, ts(i)))
        q.processAllAvailable()
      }
      val got = spark.table("err").filter(col("id") === 1L)
        .select("action", "error_cnt", "skip_cnt").collect()
        .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
      assert(got.toSeq === Seq(
        ("retry", Some(1L), Some(0L)),
        ("retry", Some(2L), Some(0L)),
        ("skip", Some(2L), Some(1L)),
        ("reset", None, None),
        ("retry", Some(1L), Some(0L))))
      // a far-future event on another key pushes the watermark past doc 1's
      // quiet horizon -> its state ages out as a "dropped" emission
      src.addData(StreamOps.ErrorEvent(99L, ts(3000)))
      q.processAllAvailable()
      src.addData(StreamOps.ErrorEvent(99L, ts(3001)))
      q.processAllAvailable()
      val dropped = spark.table("err")
        .filter(col("id") === 1L && col("action") === "dropped").count()
      assert(dropped === 1L, "quiet key must age out as dropped")
    } finally q.stop()
  }

  test("commonNormalizer runs UNCHANGED on a streaming DataFrame") {
    // The config-driven normalizer is pure scan-filter + projections (the
    // plan audit pins no-join/no-aggregate), so the exact same NormConfig
    // that drives the batch pipeline must drive a readStream → append sink
    // with no code changes — the reference's per-site normalization as an
    // always-on stream. This is the claim that matters at 100 TB: normalize
    // during ingest, not as a day-after batch.
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(String, String, String, String)]
    val cfg = graft.operators.NormOps.NormConfig(
      typeCol = "type_raw",
      dropTypes = Seq("Plone Site"),
      normObj = Map("eng" -> "en"),
      normObjCols = Some(Seq("lang_raw")),
      normProp = Seq("lang_raw" -> Seq("language")),
      normMissing = Seq("rights" -> "CC-BY-4.0"))
    val out = graft.operators.NormOps.commonNormalizer(
      src.toDF().toDF("id", "type_raw", "lang_raw", "title"), cfg)
    val q = out.writeStream.format("memory").queryName("normstream")
      .outputMode("append").start()
    try {
      src.addData(("d1", "Article", "eng", " T1 "), ("d2", "Plone Site", "eng", "T2"))
      q.processAllAvailable()
      val rows = spark.table("normstream").orderBy("id").collect()
      assert(rows.length === 1, "dropTypes must filter inside the stream")
      val r = rows.head
      assert(r.getAs[String]("language") === "en")
      assert(r.getAs[String]("rights") === "CC-BY-4.0")
      assert(r.getAs[String]("title") === "T1", "strip_fields trims in-stream")
    } finally q.stop()
  }

  test("stream_sessionize: gap timeout closes sessions and emits them") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[StreamOps.SessionEvent]
    val q = StreamOps.sessionize(src.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // session 1: user 1, two events 10 min apart
      src.addData(
        StreamOps.SessionEvent(1L, 1L, ts(0)),
        StreamOps.SessionEvent(1L, 2L, ts(10)))
      q.processAllAvailable()
      // user 1 returns 2 hours later -> previous session closes in-flight
      src.addData(StreamOps.SessionEvent(1L, 3L, ts(130)))
      q.processAllAvailable()
      // one more batch so the event-time timeout (watermark past end+gap) fires
      src.addData(StreamOps.SessionEvent(2L, 4L, ts(300)))
      q.processAllAvailable()
      src.addData(StreamOps.SessionEvent(2L, 5L, ts(600)))
      q.processAllAvailable()
      val got = spark.table("sess")
        .select("user_id", "n_events", "session_start", "session_end")
        .orderBy("session_start")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // at least user 1's first session (2 events) must have been emitted
      assert(got.nonEmpty, "no session emitted")
      assert(got(0) === ((1L, 2L)), s"first closed session wrong: ${got.toSeq}")
    } finally q.stop()
  }

  test("prepareDocs runs on a stream: stream-static admission + site pass") {
    // The whole per-site prepare pass — errored-and-indexed drop (a
    // stream-static LEFT join against the index listing), the registered
    // site normalizer, fulltext attach, site_id — compiles into one
    // append-mode streaming query: the reference's per-doc loop as a
    // continuously-running pipeline.
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(String, String, String, String, Seq[String])]
    val raw = src.toDF().toDF("id", "text", "summary", "web_html", "errors")
    val searchui = spark.createDataFrame(Seq(
      Tuple1("https://noise.eea.europa.eu/p/1"))).toDF("id")
    val q = graft.operators.SiteNormalizers.prepareDocs(raw, searchui, "noise")
      .select("id", "site_id", "cluster_name")
      .writeStream.format("memory").queryName("prep").outputMode("append").start()
    try {
      val html = "<html><head><title>T</title></head><body>x</body></html>"
      src.addData(
        ("https://noise.eea.europa.eu/p/1", "t", "s", html, Seq("web")), // indexed+errored → drop
        ("https://noise.eea.europa.eu/p/2", "t", "s", html, Seq("web")), // errored, NOT indexed → keep
        ("https://noise.eea.europa.eu/p/3", "t", "s", html, Seq()))      // clean → keep
      q.processAllAvailable()
      val got = spark.table("prep").orderBy("id").collect()
      assert(got.map(_.getString(0)).toSeq == Seq(
        "https://noise.eea.europa.eu/p/2", "https://noise.eea.europa.eu/p/3"))
      assert(got.forall(r => r.getString(1) == "noise" && r.getString(2) == "noise"))
    } finally q.stop()
  }

  test("nlpPreprocess runs unchanged on a stream (pure projection)") {
    // The NLP text-assembly front door is a per-row projection — the same
    // call compiles into an append-mode streaming query with no state.
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(Long, String, String, String)]
    val docs = src.toDF().toDF("doc_id", "web_html", "title", "pdf_text")
    val q = graft.operators.NormOps.nlpPreprocess(docs)
      .select("doc_id", "nlp_text")
      .writeStream.format("memory").queryName("nlp").outputMode("append").start()
    try {
      src.addData(
        (1L, "<p>a prose line long enough to clear the thirty char bar</p>", "T1", ""),
        (2L, "", "T2", "pdf body"))
      q.processAllAvailable()
      val got = spark.table("nlp").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got(0) ===
        ((1L, "a prose line long enough to clear the thirty char bar\n\n")))
      assert(got(1) === ((2L, "\n\nT2.\n\n\n\npdf body")))
    } finally q.stop()
  }

  test("streamWarc: files dropped into the landing dir parse exactly once") {
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = java.nio.file.Files.createTempDirectory("warcstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("warcckpt").toString
    def rec(uri: String, body: String): Array[Byte] = {
      val block = s"HTTP/1.1 200 OK\r\n\r\n$body".getBytes(UTF_8)
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes(UTF_8) ++
        block ++ "\r\n\r\n".getBytes(UTF_8)
    }
    def drop(name: String, bytes: Array[Byte]): Unit = {
      val f = new java.io.FileOutputStream(s"$dir/$name")
      f.write(bytes); f.close()
    }
    drop("a.warc", rec("https://a.eu/1", "one") ++ rec("https://a.eu/2", "two"))
    val q = StreamOps.streamWarc(spark, dir)
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      drop("b.warc", rec("https://b.eu/3", "three"))
      q.processAllAvailable()
      val uris = spark.table("warc_stream")
        .collect().map(_.getAs[String]("target_uri")).sorted.toSeq
      assert(uris == Seq("https://a.eu/1", "https://a.eu/2", "https://b.eu/3"),
        "both micro-batches parsed, no file twice")
    } finally q.stop()
  }
}
