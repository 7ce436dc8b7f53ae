package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

class WarcSourceSpec extends SparkSpec {

  private def record(typ: String, uri: String, block: Array[Byte],
      extra: String = ""): Array[Byte] = {
    val hdr = new StringBuilder
    hdr ++= "WARC/1.0\r\n"
    hdr ++= s"WARC-Type: $typ\r\n"
    if (uri.nonEmpty) hdr ++= s"WARC-Target-URI: $uri\r\n"
    hdr ++= extra
    hdr ++= s"Content-Length: ${block.length}\r\n\r\n"
    val out = new ByteArrayOutputStream()
    out.write(hdr.toString.getBytes(UTF_8))
    out.write(block)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def httpBlock(body: Array[Byte], status: String = "200 OK"): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n\r\n".getBytes(UTF_8))
    out.write(body)
    out.toByteArray
  }

  test("readWarc: records split by Content-Length, not by scanning for WARC/") {
    // the first payload CONTAINS a full "WARC/1.0" header line — a parser
    // that scans for record starts instead of honoring Content-Length
    // would split it in two
    val trap = "before\r\nWARC/1.0\r\nWARC-Type: fake\r\nafter".getBytes(UTF_8)
    val binary = Array[Byte](0, 1, 2, -1, -2, '\r', '\n', 0) // payload bytes, not text
    val bytes = record("response", "https://a.eu/trap", httpBlock(trap)) ++
      record("resource", "https://a.eu/bin", binary) ++
      record("metadata", "", "k: v".getBytes(UTF_8))
    val dir = Files.createTempDirectory("warc").toFile
    val f = new FileOutputStream(new java.io.File(dir, "t.warc"))
    f.write(bytes); f.close()

    val rows = Sources.readWarc(spark, dir.getAbsolutePath)
      .collect().map(r => (r.getAs[String]("warc_type"), r.getAs[String]("target_uri"),
        r.getAs[Any]("http_status"), r.getAs[Array[Byte]]("payload")))
    assert(rows.length == 3, s"expected 3 records, got ${rows.length}")
    val byType = rows.map(t => t._1 -> t).toMap
    assert(new String(byType("response")._4, UTF_8) == new String(trap, UTF_8),
      "embedded WARC/1.0 must stay inside the payload")
    assert(byType("response")._3 == 200)
    assert(byType("resource")._4.toSeq == binary.toSeq, "binary payload byte-exact")
    assert(byType("resource")._3 == null, "non-HTTP block has no status")
    assert(byType("metadata")._2 == null, "missing target-uri stays null")
  }

  test("readWarc: truncated tail clamps instead of failing the task") {
    val good = record("response", "https://a.eu/ok", httpBlock("fine".getBytes(UTF_8)))
    // declared Content-Length 1000, only 4 bytes present
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a.eu/cut\r\n" +
      "Content-Length: 1000\r\n\r\nHTTP").getBytes(UTF_8)
    val dir = Files.createTempDirectory("warc").toFile
    val f = new FileOutputStream(new java.io.File(dir, "t.warc"))
    f.write(good ++ bad); f.close()
    val rows = Sources.readWarc(spark, dir.getAbsolutePath).collect()
    assert(rows.length == 2, "both records surface; the truncated one clamps")
    assert(rows.exists(_.getAs[String]("target_uri") == "https://a.eu/cut"))
  }

  test("readWarc gzipped: multi-member .warc.gz (one gzip member per record)") {
    val r1 = record("response", "https://a.eu/1", httpBlock("one".getBytes(UTF_8)))
    val r2 = record("response", "https://a.eu/2", httpBlock("two".getBytes(UTF_8)))
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bo); g.write(b); g.close(); bo.toByteArray
    }
    val dir = Files.createTempDirectory("warcgz").toFile
    val f = new FileOutputStream(new java.io.File(dir, "t.warc.gz"))
    f.write(gz(r1) ++ gz(r2)); f.close() // concatenated members, CC-style
    val uris = Sources.readWarc(spark, dir.getAbsolutePath, gzipped = true)
      .collect().map(_.getAs[String]("target_uri")).sorted.toSeq
    assert(uris == Seq("https://a.eu/1", "https://a.eu/2"))
  }

  test("WarcParse: non-ASCII body with byte-denominated Content-Length") {
    // "héllo" is 6 bytes in UTF-8 for 5 chars — a char-counting parser
    // would mis-slice the next record
    val body = "héllo".getBytes(UTF_8)
    val bytes = record("resource", "https://a.eu/u", body) ++
      record("resource", "https://a.eu/v", "next".getBytes(UTF_8))
    val recs = graft.functions.WarcParse.parse(bytes)
    assert(recs.numElements() == 2)
    val first = recs.getStruct(0, 9)
    assert(new String(first.getBinary(8), UTF_8) == "héllo")
    // offsets are byte-true: record 2 starts after record 1's headers +
    // 6-byte body + the 4 inter-record CRLF bytes
    val second = recs.getStruct(1, 9)
    assert(first.getLong(6) == 0L)
    assert(second.getLong(6) == first.getLong(7) + 4,
      "second record's offset = first record's length + CRLFCRLF")
  }

  test("write → read round-trip: formatWarcRecords through readWarc is identity") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "https://a.eu/one", "2026-01-01T00:00:00Z", "plain body"),
      (2L, "https://a.eu/two", "2026-01-02T00:00:00Z", "héllo — ünïcode"),
      (3L, "https://b.eu/three", "2026-01-03T00:00:00Z", "<p>html</p>"))
      .toDF("id", "url", "fetched", "payload")
    val recs = graft.operators.SyncOps.formatWarcRecords(docs, "url", "fetched", "payload")
      .withColumn("file_key", lit("rt"))
    val files = graft.operators.SyncOps.assembleWarcFiles(recs, "file_key", "id")
    val dir = java.nio.file.Files.createTempDirectory("warcrt").toString
    Sources.writeWarc(files, dir)
    val back = Sources.readWarc(spark, dir + "/rt.warc")
      .collect().map(r => (r.getAs[String]("target_uri"), r.getAs[Any]("http_status"),
        new String(r.getAs[Array[Byte]]("payload"), java.nio.charset.StandardCharsets.UTF_8)))
      .sortBy(_._1)
    assert(back.toSeq == Seq(
      ("https://a.eu/one", 200, "plain body"),
      ("https://a.eu/two", 200, "héllo — ünïcode"),
      ("https://b.eu/three", 200, "<p>html</p>")),
      "all records round-trip byte-exactly, non-ASCII framing included")
  }

  test("WarcParse hardening: hostile Content-Length and bare-LF HTTP blocks") {
    import java.nio.charset.StandardCharsets.UTF_8
    // Content-Length near Long.MaxValue must clamp, not wrap negative
    val hostile = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a.eu/big\r\n" +
      "Content-Length: 9223372036854775800\r\n\r\nrest").getBytes(UTF_8)
    val recs = graft.functions.WarcParse.parse(hostile)
    assert(recs.numElements() == 1, "hostile length clamps to available bytes")
    // an LF-only HTTP block keeps its body
    val lfBody = "HTTP/1.1 200 OK\nContent-Type: text/html\n\nlf body".getBytes(UTF_8)
    val lfRec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a.eu/lf\r\n" +
      s"Content-Length: ${lfBody.length}\r\n\r\n").getBytes(UTF_8) ++ lfBody
    val r2 = graft.functions.WarcParse.parse(lfRec)
    assert(new String(r2.getStruct(0, 9).getBinary(8), UTF_8) == "lf body",
      "bare-LF header separator must not swallow the payload")
  }
}
