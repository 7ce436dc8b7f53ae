package graft.operators

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HttpEncoder]] against a LOCAL stub of the reference's NLP service
  * (nlp.py:99-121 wire shape): proves the [[Encoder]] contract survives a
  * real transport — same vectors as the in-process stub, bounded batches,
  * exponential-retry on transient failures, fail-fast on caller bugs,
  * null for texts the service does not return.
  */
class HttpEncoderSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val dim = 8
  private val stub = Encoder.stub(dim)

  /** One stub server per test: parses the reference request shape, answers
    * with Encoder.stub vectors keyed by text (order deliberately REVERSED
    * to force the text-equality match), with failure injection knobs.
    */
  private def withServer(
      failFirst: Int = 0, failCode: Int = 500, sleepFirstMs: Long = 0,
      omitText: String = null, wrongDim: Boolean = false,
      retryAfterSec: Long = -1)(
      body: (String, AtomicInteger, AtomicInteger) => Unit): Unit = {
    val requests = new AtomicInteger(0)
    val maxBatch = new AtomicInteger(0)
    val slept = new AtomicLong(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/embed", (ex: HttpExchange) => {
      val n = requests.incrementAndGet()
      val req = mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      assert(req.get("is_passage").asBoolean(), "reference wire shape carries is_passage")
      assert(ex.getRequestHeaders.getFirst("Content-Type") == "application/json")
      val snippets = req.get("snippets")
      maxBatch.getAndUpdate(m => math.max(m, snippets.size()))
      if (sleepFirstMs > 0 && slept.compareAndSet(0, 1)) Thread.sleep(sleepFirstMs)
      if (n <= failFirst) {
        if (retryAfterSec >= 0)
          ex.getResponseHeaders.set("Retry-After", retryAfterSec.toString)
        ex.sendResponseHeaders(failCode, -1); ex.close()
      } else {
        val root = mapper.createObjectNode()
        val arr = root.putArray("embeddings")
        val texts = (0 until snippets.size()).map(snippets.get(_).asText())
        texts.reverse.foreach { t => // reversed: the client must match by text
          if (t != omitText) {
            val e = arr.addObject()
            e.put("text", t)
            val v = e.putArray("embedding")
            val vec = stub.encode(Seq(t)).head
            if (wrongDim) v.add(1.0f) else vec.foreach(v.add)
          }
        }
        val bytes = mapper.writeValueAsBytes(root)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    // A deployment-style redirect in front of the real endpoint: 308
    // preserves the POST method and body (301/302 would degrade to GET).
    server.createContext("/old", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      ex.getResponseHeaders.set("Location",
        s"http://127.0.0.1:${server.getAddress.getPort}/embed")
      ex.sendResponseHeaders(308, -1)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/embed", requests, maxBatch)
    finally server.stop(0)
  }

  private val texts = Seq("air quality improves", "water scarcity grows",
    "soil health declines", "air quality improves") // dup exercises the map

  test("HTTP round trip returns the same vectors as the in-process stub, matched by text") {
    withServer() { (url, requests, _) =>
      val enc = new HttpEncoder(url, dim)
      val got = enc.encode(texts)
      val want = stub.encode(texts)
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) => assert(g.toSeq == w.toSeq) }
      assert(requests.get() == 1, "one batch = one POST")
    }
  }

  test("encodeDistinctWith over HTTP is bit-identical to the stub path and bounds batches") {
    val spark2 = spark
    import spark2.implicits._
    val passages = Seq("a1 text", "b2 text", "c3 text", "d4 text", "e5 text",
      "a1 text", "b2 text").toDF("passage") // 5 distinct
    withServer() { (url, _, maxBatch) =>
      val enc = new HttpEncoder(url, dim)
      val viaHttp = EmbedOps.encodeDistinctWith(passages, "passage", enc, batchSize = 2)
        .collect().map(r => r.getString(0) -> r.getSeq[Float](1).toSeq).toMap
      val viaStub = EmbedOps.encodeDistinctWith(passages, "passage", stub, batchSize = 2)
        .collect().map(r => r.getString(0) -> r.getSeq[Float](1).toSeq).toMap
      assert(viaHttp == viaStub, "transport must not change a single bit")
      assert(viaHttp.size == 5)
      assert(maxBatch.get() <= 2, "the encoder must never re-chunk the caller's batches")
    }
  }

  test("transient 5xx retries with backoff until success") {
    withServer(failFirst = 2) { (url, requests, _) =>
      val enc = new HttpEncoder(url, dim, maxRetries = 4, retryBackoffMs = 10)
      val got = enc.encode(Seq("retry me"))
      assert(got.head.toSeq == stub.encode(Seq("retry me")).head.toSeq)
      assert(requests.get() == 3, "two failures then the success")
    }
  }

  test("request timeout counts as transient and retries") {
    withServer(sleepFirstMs = 800) { (url, requests, _) =>
      val enc = new HttpEncoder(url, dim,
        requestTimeoutMs = 200, maxRetries = 2, retryBackoffMs = 10)
      val got = enc.encode(Seq("slow first answer"))
      assert(got.head.toSeq == stub.encode(Seq("slow first answer")).head.toSeq)
      assert(requests.get() >= 2, "the timed-out first attempt was retried")
    }
  }

  test("exhausted retries throw with the last transport error attached") {
    withServer(failFirst = Int.MaxValue) { (url, requests, _) =>
      val enc = new HttpEncoder(url, dim, maxRetries = 1, retryBackoffMs = 10)
      val e = intercept[IllegalStateException] { enc.encode(Seq("never works")) }
      assert(e.getCause != null, "the last IOException rides along for diagnosis")
      assert(requests.get() == 2, "maxRetries=1 means exactly two attempts")
    }
  }

  test("a 4xx is a caller bug: fail fast, no retry") {
    withServer(failFirst = Int.MaxValue, failCode = 400) { (url, requests, _) =>
      val enc = new HttpEncoder(url, dim, maxRetries = 3, retryBackoffMs = 10)
      intercept[IllegalArgumentException] { enc.encode(Seq("bad request")) }
      assert(requests.get() == 1, "4xx must not burn retries")
    }
  }

  test("a service behind a 308 redirect still answers (Redirect.NORMAL)") {
    // the JDK client default is Redirect.NEVER, which would hard-fail any
    // service deployed behind an ingress rewrite or load-balancer move
    withServer() { (url, requests, _) =>
      val enc = new HttpEncoder(url.replace("/embed", "/old"), dim)
      val got = enc.encode(Seq("redirected text"))
      assert(got.head.toSeq == stub.encode(Seq("redirected text")).head.toSeq)
      assert(requests.get() == 1, "exactly one POST reaches the real endpoint")
    }
  }

  test("a 429's Retry-After raises the wait above the configured backoff") {
    withServer(failFirst = 1, failCode = 429, retryAfterSec = 1) {
      (url, requests, _) =>
        val enc = new HttpEncoder(url, dim, maxRetries = 2, retryBackoffMs = 10)
        val t0 = System.nanoTime()
        val got = enc.encode(Seq("throttled text"))
        val waitedMs = (System.nanoTime() - t0) / 1e6
        assert(got.head.toSeq == stub.encode(Seq("throttled text")).head.toSeq)
        assert(requests.get() == 2, "one throttle then the success")
        assert(waitedMs >= 1000,
          f"Retry-After: 1 must override the 10 ms backoff (waited $waitedMs%.0f ms)")
    }
  }

  test("a text the service does not return maps to null (reference no-match keeps passage unembedded)") {
    withServer(omitText = "lost text") { (url, _, _) =>
      val enc = new HttpEncoder(url, dim)
      val got = enc.encode(Seq("kept text", "lost text"))
      assert(got(0) != null && got(0).toSeq == stub.encode(Seq("kept text")).head.toSeq)
      assert(got(1) == null)
    }
  }

  test("a wrong-width vector is a misconfigured service: throw, not truncate") {
    withServer(wrongDim = true) { (url, _, _) =>
      val enc = new HttpEncoder(url, dim)
      intercept[IllegalArgumentException] { enc.encode(Seq("mismatched model")) }
    }
  }

  test("semanticSearchTopKWith over HTTP equals the stub-encoder ranking end to end") {
    withServer() { (url, _, _) =>
      val docs = graft.Tables.documents(spark, sfDir).limit(40)
      val viaHttp = EmbedOps.semanticSearchTopKWith(
        docs, "environmental data pipelines", k = 5,
        new HttpEncoder(url, dim), batchSize = 64)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val viaStub = EmbedOps.semanticSearchTopKWith(
        docs, "environmental data pipelines", k = 5, stub, batchSize = 64)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaHttp == viaStub)
    }
  }
}
