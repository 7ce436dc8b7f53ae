package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import graft.functions.{Gunzip, WarcParse}

/** Generative fuzz for the WARC ingest kernels — the most hostile input
  * class the engine faces: at 100 TB an archive sweep WILL contain
  * truncated files, lying Content-Length headers, split CRLFs and
  * corrupt gzip members, and the kernels' contract is clamp-don't-abort
  * (WarcExpressions.scala doc): imperfect records may surface
  * imperfectly, but a task must never throw or hang on one bad file.
  * Seeded (reproducible) like MainContentSpec's tag-soup fuzz.
  */
class WarcFuzzSpec extends SparkSpec {

  private def goodRecord(uri: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\nContent-Length: ${body.length}\r\n\r\n").getBytes(UTF_8))
    out.write(body)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bo); g.write(b); g.close(); bo.toByteArray
  }

  test("fuzz: malformed WARC framing never throws and keeps byte-bounded rows") {
    // Random concatenations of good records and framing lies: Content-Length
    // off in both directions, non-numeric, negative, astronomically large;
    // missing blank lines; bare-LF headers; split/lone CR; headers without
    // colons; random binary garbage; embedded "WARC/1.0" payload traps;
    // truncated version lines. The parse must return (not throw, not hang)
    // and every surfaced row must stay inside the input's byte range.
    val rnd = new scala.util.Random(20260814L)
    def lyingRecord(): Array[Byte] = {
      val body = ("body" * (1 + rnd.nextInt(8))).getBytes(UTF_8)
      val declared = rnd.nextInt(6) match {
        case 0 => (body.length + 1 + rnd.nextInt(5000)).toString // too big
        case 1 => math.max(0, body.length - 1 - rnd.nextInt(8)).toString // too small
        case 2 => "-" + (1 + rnd.nextInt(100))                   // negative
        case 3 => "9223372036854775800"                          // ~Long.Max
        case 4 => "not-a-number"
        case _ => ""                                             // empty value
      }
      (s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: $declared\r\n\r\n")
        .getBytes(UTF_8) ++ body ++ "\r\n\r\n".getBytes(UTF_8)
    }
    val frags: Array[() => Array[Byte]] = Array(
      () => goodRecord(s"https://a.eu/${rnd.nextInt(100)}",
        ("ok " * (1 + rnd.nextInt(10))).getBytes(UTF_8)),
      () => goodRecord("https://a.eu/trap",
        "inner\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\ntrap".getBytes(UTF_8)),
      () => lyingRecord(),
      () => "WARC/1.0\r\nNo-Blank-Line-Header: v\r\n".getBytes(UTF_8), // no terminator
      () => "WARC/1.0\nWARC-Type: response\nContent-Length: 3\n\nabc\n\n".getBytes(UTF_8),
      () => "WARC/1.0\r\nheader-without-colon\r\n\r\n".getBytes(UTF_8),
      () => "WARC/1.0\r".getBytes(UTF_8),              // split CRLF at EOF
      () => "WARC/".getBytes(UTF_8),                   // truncated version line
      () => "\r\n\r\n\r\n".getBytes(UTF_8),            // stray separators
      () => Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(256).toByte), // garbage
      () => "\r".getBytes(UTF_8),
      () => "\n".getBytes(UTF_8))
    var t = 0
    while (t < 400) {
      val n = 1 + rnd.nextInt(12)
      val out = new ByteArrayOutputStream()
      var j = 0
      while (j < n) { out.write(frags(rnd.nextInt(frags.length))()); j += 1 }
      val bytes = out.toByteArray
      val recs = WarcParse.parse(bytes) // must not throw
      var i = 0
      while (i < recs.numElements()) {
        val r = recs.getStruct(i, 9)
        val offset = r.getLong(6)
        val recLen = r.getLong(7)
        assert(offset >= 0 && offset < bytes.length,
          s"offset $offset outside [0, ${bytes.length}) at case $t")
        assert(recLen >= 0 && offset + recLen <= bytes.length,
          s"record [$offset, ${offset + recLen}) exceeds input ${bytes.length} at case $t")
        assert(r.getBinary(8).length <= recLen,
          s"payload larger than its record at case $t")
        if (i > 0)
          assert(offset > recs.getStruct(i - 1, 9).getLong(6),
            s"offsets must strictly advance (termination guarantee) at case $t")
        i += 1
      }
      t += 1
    }
  }

  test("fuzz: good records BEFORE the first framing lie always parse exactly") {
    // Clamp semantics, not just no-throw: a lie can at worst eat records
    // AFTER it (resync scans forward for the next record start); everything
    // before the first lie is intact with byte-exact payloads.
    val rnd = new scala.util.Random(20260815L)
    var t = 0
    while (t < 200) {
      val good = (0 until 1 + rnd.nextInt(5)).map { k =>
        val body = (s"payload-$t-$k " * (1 + rnd.nextInt(6))).getBytes(UTF_8)
        (s"https://g.eu/$t/$k", body)
      }
      val out = new ByteArrayOutputStream()
      good.foreach { case (u, b) => out.write(goodRecord(u, b)) }
      // one lying record, then optional garbage
      out.write(("WARC/1.0\r\nWARC-Type: response\r\n" +
        s"Content-Length: ${1000 + rnd.nextInt(100000)}\r\n\r\nshort").getBytes(UTF_8))
      if (rnd.nextBoolean())
        out.write(Array.fill(rnd.nextInt(30))(rnd.nextInt(256).toByte))
      val recs = WarcParse.parse(out.toByteArray)
      assert(recs.numElements() >= good.length,
        s"the ${good.length} good records before the lie must all surface (case $t)")
      good.zipWithIndex.foreach { case ((u, b), k) =>
        val r = recs.getStruct(k, 9)
        assert(r.getUTF8String(1).toString == u, s"uri $k intact (case $t)")
        assert(java.util.Arrays.equals(r.getBinary(8), b),
          s"payload $k byte-exact (case $t)")
      }
      t += 1
    }
  }

  test("fuzz: truncated gzip members never throw and yield a prefix of the truth") {
    // Every truncation point of a multi-member .warc.gz: decompress must
    // return whatever decoded before the cut — always a byte-prefix of the
    // full stream, never an exception. (A corrupt deflate stream detected
    // mid-member keeps the bytes decoded so far; a cut inside the trailer
    // keeps the whole member.)
    val full = gz(goodRecord("https://a.eu/1", ("one " * 50).getBytes(UTF_8))) ++
      gz(goodRecord("https://a.eu/2", ("two " * 50).getBytes(UTF_8))) ++
      gz(goodRecord("https://a.eu/3", ("three " * 50).getBytes(UTF_8)))
    val truth = Gunzip.decompress(full)
    assert(truth.length > 0, "sanity: the untruncated stream decodes")
    val rnd = new scala.util.Random(20260816L)
    var t = 0
    while (t < 300) {
      val cut = rnd.nextInt(full.length) // 0 until full.length
      val got = Gunzip.decompress(java.util.Arrays.copyOfRange(full, 0, cut))
      assert(got.length <= truth.length, s"cut at $cut over-produced")
      assert(java.util.Arrays.equals(got,
        java.util.Arrays.copyOfRange(truth, 0, got.length)),
        s"cut at $cut produced non-prefix output")
      t += 1
    }
    // and the parse of a truncated decompression still never throws
    val half = Gunzip.decompress(java.util.Arrays.copyOfRange(full, 0, full.length / 2))
    assert(WarcParse.parse(half) != null)
  }

  test("fuzz: corrupt gzip bytes (bit flips) never throw") {
    // Flipping bytes mid-stream: output may legitimately diverge from the
    // original AFTER the corruption point (deflate detects it late), so the
    // only contract is never-throw + bounded output.
    val full = gz(goodRecord("https://a.eu/1", ("one " * 80).getBytes(UTF_8))) ++
      gz(goodRecord("https://a.eu/2", ("two " * 80).getBytes(UTF_8)))
    val rnd = new scala.util.Random(20260817L)
    var t = 0
    while (t < 300) {
      val b = full.clone()
      var flips = 1 + rnd.nextInt(4)
      while (flips > 0) {
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
        flips -= 1
      }
      val got = Gunzip.decompress(b) // must not throw
      assert(got != null && got.length <= Gunzip.MaxOut)
      assert(WarcParse.parse(got) != null) // downstream parse survives too
      t += 1
    }
  }
}
