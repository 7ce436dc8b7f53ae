package graft.functions

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) record parsing as a native expression — the ingest
  * format crawl corpora actually arrive in at the 100 TB scale
  * (Common Crawl ships ~1 GB `.warc.gz` files; the reference crawler
  * fetches live HTTP instead, but an offline re-run of its pipeline over an
  * archived crawl starts exactly here).
  *
  * Input: the raw bytes of one WARC file (uncompressed — see [[Gunzip]] for
  * the `.warc.gz` path). Output: one struct per record —
  * (warc_type, target_uri, warc_date, content_type, content_length,
  * http_status, payload) — where `payload` is the content block with HTTP
  * response headers stripped when the block is an HTTP message (the
  * `application/http` convention: status line + headers, CRLFCRLF, body),
  * and `http_status` is the parsed status-line code (null for non-HTTP
  * records like warcinfo/metadata).
  *
  * The parse is byte-exact: record boundaries come ONLY from
  * `Content-Length` (a payload containing `WARC/1.0` must not split a
  * record), header names are case-insensitive, and a truncated final
  * record clamps to the available bytes rather than throwing — a 100 TB
  * ingest cannot abort on one bad file tail.
  *
  * Scale: parallelism is per-FILE (the `binaryFile` source yields one row
  * per file) — the WARC convention caps files at ~1 GB precisely so that
  * file-level parallelism is the distribution unit; 100 TB ≈ 100k files ≈
  * 100k independent tasks with no shuffle at all.
  */
case class WarcParse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WarcParse.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WarcParse.parse(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WarcParse.parse($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WarcParse {

  val recordType: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),
    // byte offset of the record's "WARC/" line and the record's total size
    // (headers + content block, excluding the inter-record CRLFs) — the
    // two numbers a CDX lookup index needs for range reads
    StructField("offset", LongType),
    StructField("record_length", LongType),
    StructField("payload", BinaryType)))

  val schema: ArrayType = ArrayType(recordType, containsNull = false)

  /** Parse one header block starting at `pos` (first line already known to
    * be the version line). Returns (headersLowercased, posAfterBlankLine).
    * Tolerates bare-LF files by also accepting '\n' line ends.
    */
  private def parseHeaders(b: Array[Byte], start: Int): (Map[String, String], Int) = {
    var pos = start
    var headers = Map.empty[String, String]
    while (pos < b.length) {
      // line end: CRLF or bare LF
      var eol = pos
      while (eol < b.length && b(eol) != '\n') eol += 1
      val hasCr = eol > pos && b(eol - 1) == '\r'
      val lineEnd = if (hasCr) eol - 1 else eol
      if (lineEnd == pos) return (headers, math.min(eol + 1, b.length)) // blank line
      val line = new String(b, pos, lineEnd - pos, StandardCharsets.UTF_8)
      val colon = line.indexOf(':')
      if (colon > 0) {
        headers += (line.substring(0, colon).trim.toLowerCase ->
          line.substring(colon + 1).trim)
      }
      pos = eol + 1
    }
    (headers, b.length)
  }

  def parse(bytes: Array[Byte]): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[GenericInternalRow]
    var pos = 0
    val n = bytes.length
    while (pos < n) {
      // skip inter-record CRLFs / LFs
      while (pos < n && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= n) return new GenericArrayData(out.toArray[Any])
      // a record starts with "WARC/" — anything else means a corrupt tail:
      // scan forward to the next plausible record start rather than abort
      if (!startsWith(bytes, pos, "WARC/")) {
        val next = indexOf(bytes, pos, "\nWARC/")
        if (next < 0) return new GenericArrayData(out.toArray[Any])
        pos = next + 1
      }
      // skip the version line
      var eol = pos
      while (eol < n && bytes(eol) != '\n') eol += 1
      val recStart = pos
      val (headers, bodyStart) = parseHeaders(bytes, math.min(eol + 1, n))
      val len = headers.get("content-length").flatMap(s => s.toLongOption).getOrElse(0L)
      // clamp BEFORE adding: a hostile Content-Length near Long.MaxValue
      // must not wrap bodyStart + len negative and abort the task
      val safeLen = math.max(0L, math.min(len, (n - bodyStart).toLong)).toInt
      val end = bodyStart + safeLen
      val block = java.util.Arrays.copyOfRange(bytes, bodyStart, end)
      out += buildRow(headers, block, recStart.toLong, (end - recStart).toLong)
      pos = end
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def buildRow(headers: Map[String, String], block: Array[Byte],
      offset: Long, recordLength: Long): GenericInternalRow = {
    // application/http blocks: strip the status line + headers, surface the
    // status code; everything else passes through whole
    var status: Any = null
    var payload = block
    if (startsWith(block, 0, "HTTP/")) {
      // CRLFCRLF per RFC, but tolerate bare-LF blocks the same way
      // parseHeaders does — an LF-only response must not lose its body
      val sepCrlf = indexOf(block, 0, "\r\n\r\n")
      val sepLf = if (sepCrlf >= 0) -1 else indexOf(block, 0, "\n\n")
      val headerEnd =
        if (sepCrlf >= 0) sepCrlf + 4
        else if (sepLf >= 0) sepLf + 2
        else block.length
      val firstEol = {
        var i = 0; while (i < block.length && block(i) != '\n') i += 1; i
      }
      val statusLine = new String(block, 0, firstEol, StandardCharsets.UTF_8)
      val parts = statusLine.split(" ")
      if (parts.length >= 2) parts(1).takeWhile(_.isDigit).toIntOption.foreach(s => status = s)
      payload = java.util.Arrays.copyOfRange(block, headerEnd, block.length)
    }
    def h(k: String): Any =
      headers.get(k).map(UTF8String.fromString).orNull
    new GenericInternalRow(Array[Any](
      h("warc-type"), h("warc-target-uri"), h("warc-date"), h("content-type"),
      headers.get("content-length").flatMap(_.toLongOption).getOrElse(0L),
      status, offset, recordLength, payload))
  }

  private def startsWith(b: Array[Byte], pos: Int, s: String): Boolean = {
    if (pos + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(pos + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def indexOf(b: Array[Byte], from: Int, s: String): Int = {
    var i = from
    val limit = b.length - s.length
    while (i <= limit) {
      if (startsWith(b, i, s)) return i
      i += 1
    }
    -1
  }
}

/** Multi-member gzip decompression — `.warc.gz` files are a CONCATENATION
  * of one gzip member per record (the Common Crawl convention, so archives
  * can be range-read per record); `java.util.zip.GZIPInputStream` consumes
  * all members. Null-safe; a corrupt stream yields the bytes decoded so
  * far rather than failing the task (same clamp-don't-abort policy as
  * [[WarcParse]]).
  */
case class Gunzip(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Gunzip.decompress(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Gunzip.decompress($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Gunzip {
  /** One BinaryType value caps at ~2 GB; decompression stops (truncates)
    * at `MaxOut` instead of dying in ByteArrayOutputStream.grow — the
    * same clamp-don't-abort policy as the parser. An archive inflating
    * past the cap should be split upstream (the WARC size convention
    * exists precisely so this does not happen).
    */
  val MaxOut: Int = Int.MaxValue - 64

  def decompress(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(bytes.length * 4, 64))
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0 && out.size() < MaxOut - buf.length) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      if (n > 0 && out.size() < MaxOut) out.write(buf, 0, math.min(n, MaxOut - out.size()))
      in.close()
    } catch {
      case _: java.io.IOException => // keep whatever decoded before the corruption
    }
    out.toByteArray
  }
}
