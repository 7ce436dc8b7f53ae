package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** The reference [[Encoder]] implementation over HTTP — the transport of
  * the reference's embedding sidecar (dags/normalizers/lib/nlp.py:99-121
  * `add_embeddings_to_doc`: POST `{"is_passage": true, "snippets": [...]}`
  * to the NLP service with JSON accept/content-type headers, retried with
  * exponential backoff (`@retry(wait=wait_exponential(),
  * stop=stop_after_attempt(5))`), then read `{"embeddings": [{"text":
  * ..., "embedding": [...]}, ...]}` and match vectors back BY TEXT
  * EQUALITY, a text the service does not return staying unembedded).
  *
  * Same wire shape, same failure semantics, Spark-native plumbing:
  *
  *  - the instance is a small serializable value (url + knobs); the
  *    [[HttpClient]] is NOT shipped — executors share one per JVM from
  *    the companion's cache, so a 1000-task stage opens a handful of
  *    connection pools, not a thousand;
  *  - one POST per [[encode]] call = one per `batchSize` distinct texts
  *    under [[EmbedOps.encodeDistinctWith]] — the batch bound is the
  *    caller's, the encoder never re-chunks;
  *  - transient failures (connect/timeout/5xx/429) retry up to
  *    `maxRetries` with exponential backoff; a 4xx is a caller bug and
  *    fails fast; exhausted retries throw with the last cause attached —
  *    the task (then Spark's task retry) is the outer retry loop, exactly
  *    where a cluster wants it;
  *  - a text missing from the response maps to null (the reference's
  *    no-match behavior: the passage keeps no embedding and the attach
  *    join leaves it NULL); a returned vector of the wrong width throws —
  *    that is a misconfigured service, not a data condition.
  */
final class HttpEncoder(
    val url: String,
    override val dim: Int,
    val connectTimeoutMs: Long = 5000L,
    val requestTimeoutMs: Long = 30000L,
    val maxRetries: Int = 4,
    val retryBackoffMs: Long = 200L) extends Encoder {
  require(dim > 0, "dim must be positive")
  require(maxRetries >= 0, "maxRetries must be non-negative")

  override def encode(batch: Seq[String]): Seq[Array[Float]] = {
    if (batch.isEmpty) return Seq.empty
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Accept", "application/json")
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        HttpEncoder.requestJson(batch), UTF_8))
      .build()
    var attempt = 0
    var body: String = null
    var lastErr: Throwable = null
    var retryAfterMs = -1L // from a 429's Retry-After header, else -1
    while (body == null && attempt <= maxRetries) {
      if (attempt > 0) {
        // exponential, capped at 30 s per wait: an uncapped doubling with a
        // high maxRetries would park a task for hours against a down
        // service; 30 s is past any transient blip and Spark's task retry
        // is the outer loop for anything longer. A 429's Retry-After
        // (delta-seconds form) raises the wait up to the same cap — the
        // service's own pacing signal beats a blind backoff.
        val backoff = math.min(retryBackoffMs << math.min(attempt - 1, 16), 30000L)
        Thread.sleep(math.min(math.max(backoff, retryAfterMs), 30000L))
      }
      retryAfterMs = -1L
      try {
        val resp = HttpEncoder.client(connectTimeoutMs)
          .send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
        val code = resp.statusCode()
        if (code >= 200 && code < 300) body = resp.body()
        else if (code >= 500 || code == 429) {
          lastErr = new java.io.IOException(s"encoder service returned HTTP $code")
          if (code == 429) {
            val ra = resp.headers().firstValue("Retry-After")
            if (ra.isPresent)
              // delta-seconds only; the HTTP-date form parses to -1 and
              // falls back to the exponential backoff
              retryAfterMs =
                try ra.get.trim.toLong * 1000L
                catch { case _: NumberFormatException => -1L }
          }
        } else throw new IllegalArgumentException(
          // redirects (3xx) are followed by the client (Redirect.NORMAL),
          // so reaching here means a genuine client error (4xx) or a
          // protocol-downgrade redirect the client refused
          s"encoder service answered HTTP $code (non-retryable): ${resp.body().take(200)}")
      } catch {
        // connect refused, reset, request timeout — all transient
        case e: java.io.IOException => lastErr = e
      }
      attempt += 1
    }
    if (body == null)
      throw new IllegalStateException(
        s"encoder service at $url failed after ${maxRetries + 1} attempts", lastErr)
    HttpEncoder.parseEmbeddings(body, batch, dim)
  }
}

object HttpEncoder {

  /** One client per (JVM, connect timeout) — executors reuse the pool
    * across tasks and batches; never serialized.
    */
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[Long, HttpClient]()
  private def client(connectTimeoutMs: Long): HttpClient =
    clients.computeIfAbsent(connectTimeoutMs, ct =>
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(ct))
        // the JDK default is NEVER, which would hard-fail a service
        // deployed behind ANY redirect; NORMAL follows same-or-upgraded-
        // scheme redirects and still refuses HTTPS→HTTP downgrades. Note
        // the JDK client resends a 307/308 redirect with the POST body
        // intact but degrades 301/302 to a bodyless GET (per the spec's
        // historical-behavior allowance) — so only 307/308-fronted
        // deployments actually work end-to-end; a 301/302 front surfaces
        // as the service's GET-handler response (typically a non-2xx
        // thrown below as non-retryable), not as a silent wrong answer
        .followRedirects(HttpClient.Redirect.NORMAL)
        .build())

  private val mapper = new ObjectMapper()

  /** `{"is_passage": true, "snippets": [...]}` — nlp.py:102-104 verbatim. */
  private[operators] def requestJson(batch: Seq[String]): String = {
    val root = mapper.createObjectNode()
    root.put("is_passage", true)
    val arr = root.putArray("snippets")
    batch.foreach(arr.add)
    mapper.writeValueAsString(root)
  }

  /** Parse `{"embeddings": [{"text":..., "embedding":[...]}]}` and match
    * vectors back to the inputs by text equality (nlp.py:116-121). Missing
    * text → null vector; wrong-width vector → throw.
    */
  private[operators] def parseEmbeddings(
      json: String, batch: Seq[String], dim: Int): Seq[Array[Float]] = {
    val root = mapper.readTree(json)
    val arr = root.get("embeddings")
    require(arr != null && arr.isArray,
      s"encoder response has no embeddings array: ${json.take(200)}")
    val byText = new java.util.HashMap[String, Array[Float]]()
    val it = arr.elements()
    while (it.hasNext) {
      val e: JsonNode = it.next()
      val text = if (e.hasNonNull("text")) e.get("text").asText() else null
      val vecNode = e.get("embedding")
      if (text != null && vecNode != null && vecNode.isArray) {
        require(vecNode.size() == dim,
          s"encoder returned a ${vecNode.size()}-d vector, expected $dim")
        val v = new Array[Float](dim)
        var i = 0
        while (i < dim) { v(i) = vecNode.get(i).floatValue(); i += 1 }
        byText.put(text, v)
      }
    }
    batch.map(byText.get(_)) // null = service returned nothing for the text
  }
}
