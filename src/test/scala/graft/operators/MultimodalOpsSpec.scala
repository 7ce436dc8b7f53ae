package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("extractMeta decodes synthetic payload headers with the documented formula") {
    val media = MultimodalOps.syntheticMedia(spark, sfDir)
    val got = MultimodalOps.extractMeta(media).toDF().orderBy("doc_id").limit(5).collect()
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("ok"))
      assert(r.getAs[String]("format") === MultimodalOps.Formats((id % 3).toInt))
      assert(r.getAs[Int]("width") === (id % 512 + 64).toInt)
      assert(r.getAs[Int]("height") === (id % 384 + 48).toInt)
      assert(r.getAs[Long]("n_bytes") > 0L)
    }
  }

  test("bad payloads yield ok=false rows instead of failing the job") {
    val df = Seq(
      (1L, "GFT1|jpeg|10|20|body".getBytes("UTF-8")),
      (2L, "not a media payload".getBytes("UTF-8")),
      (3L, Array[Byte](0, 1, 2, 3)))
      .toDF("doc_id", "payload")
    val got = MultimodalOps.extractMeta(df).toDF().orderBy("doc_id").collect()
    assert(got.map(_.getAs[Boolean]("ok")).toSeq === Seq(true, false, false))
    assert(got(0).getAs[Int]("width") === 10 && got(0).getAs[Int]("height") === 20)
    assert(got(1).getAs[String]("format") === "unknown")
  }

  test("well-formed header with garbage dimensions yields ok=false, never throws") {
    // The totality contract under adversarial payloads: a known magic +
    // format but unparseable or overflowing dimensions must degrade to
    // ok=false like any other bad blob.
    val rows = Seq(
      MultimodalOps.MediaRow(7L, "GFT1|png|notanum|48|body".getBytes("UTF-8")),
      MultimodalOps.MediaRow(8L, "GFT1|png|99999999999999|48|body".getBytes("UTF-8")),
      MultimodalOps.MediaRow(9L, "GFT1|png|64|#|body".getBytes("UTF-8")))
    val out = MultimodalOps.decodeBatch(rows)
    assert(out.forall(m => !m.ok && m.format === "unknown" && m.width === -1))
  }

  test("truncated and hostile headers degrade to ok=false (the WARC clamp discipline)") {
    val rows = Seq(
      MultimodalOps.MediaRow(1L, "GFT1|jp".getBytes("UTF-8")), // truncated mid-header
      MultimodalOps.MediaRow(2L, "GFT1|png|64|48".getBytes("UTF-8")), // no body separator
      MultimodalOps.MediaRow(3L, "GFT1|png|-5|48|body".getBytes("UTF-8")), // negative width
      MultimodalOps.MediaRow(4L, "GFT1|png|0|48|body".getBytes("UTF-8")), // zero width
      MultimodalOps.MediaRow(5L, "GFT1|png|2000000000|2|body".getBytes("UTF-8")), // allocation-attack dims
      MultimodalOps.MediaRow(6L, Array[Byte](0x47, 0x46, 0x54, 0x31, '|'.toByte, -1, -2, -3)), // invalid UTF-8 after magic
      MultimodalOps.MediaRow(7L, Array.emptyByteArray))
    val out = MultimodalOps.decodeBatch(rows)
    assert(out.map(_.doc_id) == rows.map(_.doc_id), "totality: one row out per row in")
    assert(out.forall(m => !m.ok && m.width === -1 && m.height === -1),
      s"every hostile payload must degrade, got ${out.filter(_.ok)}")
    // and the boundary itself is INCLUSIVE: a dimension exactly at the cap decodes
    val atCap = MultimodalOps.decodeBatch(Seq(MultimodalOps.MediaRow(8L,
      s"GFT1|png|${MultimodalOps.MaxDim}|1|body".getBytes("UTF-8"))))
    assert(atCap.head.ok && atCap.head.width === MultimodalOps.MaxDim)
    val overCap = MultimodalOps.decodeBatch(Seq(MultimodalOps.MediaRow(9L,
      s"GFT1|png|${MultimodalOps.MaxDim + 1}|1|body".getBytes("UTF-8"))))
    assert(!overCap.head.ok)
  }

  test("resize clamps dimensions to fit, preserves aspect ratio, round-trips decode") {
    val media = MultimodalOps.syntheticMedia(spark, sfDir)
    val resized = MultimodalOps.resize(media, maxW = 100, maxH = 100).toDF()
    val metas = MultimodalOps.extractMeta(resized).toDF()
      .orderBy("doc_id").limit(200).collect()
    metas.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("ok"), s"doc $id must stay decodable after resize")
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w <= 100 && h <= 100, s"doc $id not clamped: ${w}x$h")
      val (ow, oh) = ((id % 512 + 64).toInt, (id % 384 + 48).toInt)
      if (ow <= 100 && oh <= 100) assert(w === ow && h === oh, "small images untouched")
      else {
        val scale = math.min(100.0 / ow, 100.0 / oh)
        assert(w === (ow * scale).toInt.max(1) && h === (oh * scale).toInt.max(1))
      }
    }
  }

  test("frameSample fans one payload into bounded fixed-size frame rows") {
    val body = Array.tabulate[Byte](100)(_.toByte)
    val df = Seq((7L, body)).toDF("doc_id", "payload")
    val frames = MultimodalOps.frameSample(df, frameBytes = 10, stride = 2, maxFrames = 3)
      .collect().sortBy(_.frame_idx)
    // offsets 0, 20, 40 (stride 2 x 10 bytes), capped at 3 frames
    assert(frames.map(_.offset).toSeq === Seq(0L, 20L, 40L))
    assert(frames.forall(_.frame.length === 10))
    assert(frames(1).frame.toSeq === body.slice(20, 30).toSeq)
  }

  test("decode batches are bounded by batchSize, not partition size") {
    val media = MultimodalOps.syntheticMedia(spark, sfDir).repartition(1)
    // 500 docs in ONE partition, batch 32 — memory contract holds iff grouped
    // iteration works; result must still be complete and correct.
    val n = MultimodalOps.extractMeta(media, batchSize = 32).filter(_.ok).count()
    assert(n === 500L)
  }
}
