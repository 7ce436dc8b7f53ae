package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads travel as opaque `binary` columns with
  * typed metadata beside them; decode / feature-extraction runs as batched
  * per-partition processing so executor memory is bounded by batch size ×
  * item size, never by partition size.
  *
  * The codec itself is STUBBED deterministically (no image/audio libraries in
  * this container): payloads carry a parseable header (`GFT1|format|w|h|`)
  * followed by opaque bytes, and "decode" parses the header — the Spark-side
  * plumbing (binary schema, batch iteration, typed output encoders,
  * partition-preserving execution) is the real, tested part. Swapping
  * `decodeBatch` for a JPEG/PNG decoder changes no plan shape.
  */
object MultimodalOps {

  val Magic = "GFT1"
  val Formats = Seq("jpeg", "png", "webp")

  /** Plausibility cap for header-claimed dimensions (2^20 px per side —
    * generous for any real image, small enough that w×h×4 can never be an
    * allocation attack on the decoder behind this stub).
    */
  val MaxDim: Int = 1 << 20

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, format: String, width: Int, height: Int, n_bytes: Long, ok: Boolean)

  /** Deterministic fake payloads derived from the documents table: a
    * parseable header plus the doc text as opaque body bytes.
    */
  def syntheticMedia(s: SparkSession, d: String): DataFrame = {
    val fmt = element_at(array(Formats.map(lit): _*), (col("doc_id") % 3 + 1).cast("int"))
    val width = (col("doc_id") % 512 + 64).cast("int")
    val height = (col("doc_id") % 384 + 48).cast("int")
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(
        concat(lit(Magic), lit("|"), fmt, lit("|"), width, lit("|"), height, lit("|"), col("text")),
        "UTF-8").as("payload"))
  }

  /** The stubbed codec: one BATCH of payloads in, metadata out. A real
    * implementation would hand the batch to a native decoder; the contract
    * (bounded batch, no per-item JVM churn, total function — bad payloads
    * yield ok=false rows, they never throw) is what matters at scale.
    */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaMeta] =
    batch.map { m =>
      val s = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
      val parts = s.split("\\|", 5)
      // toIntOption, not toInt: a payload with a well-formed header but
      // garbage dimensions must yield ok=false, never throw — the totality
      // contract above is what lets a 100 TB scan survive adversarial blobs.
      // Dimensions must also be PLAUSIBLE (0 < d ≤ 2^20): a hostile header
      // claiming a negative or 2-billion-pixel-wide image must not reach a
      // real decoder's allocation path as ok=true — the same clamp
      // discipline WarcParse applies to hostile Content-Length.
      val dims =
        if (parts.length == 5 && parts(0) == Magic && Formats.contains(parts(1)))
          for {
            w <- parts(2).toIntOption if w > 0 && w <= MaxDim
            h <- parts(3).toIntOption if h > 0 && h <= MaxDim
          } yield (w, h)
        else None
      dims match {
        case Some((w, h)) =>
          MediaMeta(m.doc_id, parts(1), w, h, m.payload.length.toLong, ok = true)
        case None =>
          MediaMeta(m.doc_id, "unknown", -1, -1, m.payload.length.toLong, ok = false)
      }
    }

  /** Batched partition-wise decode: groups each partition's iterator into
    * `batchSize` chunks (memory ∝ batchSize, not partition size) and flat-maps
    * the codec over them. Partitioning is preserved — no shuffle.
    */
  def extractMeta(media: DataFrame, batchSize: Int = 32): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    extractMeta(syntheticMedia(s, d)).toDF()
      .select("doc_id", "format", "width", "height", "n_bytes", "ok")
      .orderBy("doc_id")

  // ------------------------------------------------------------------ resize

  /** Batched resize: payload in, payload out with the target dimensions.
    * The codec is stubbed (header rewrite + body passthrough); the contract
    * a real decoder slots into is the same batched, partition-preserving,
    * total-function shape as `extractMeta`. Aspect ratio clamps to fit
    * within (maxW, maxH) like a real thumbnailer.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int, batchSize: Int = 32): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { m =>
        val metas = decodeBatch(Seq(m))
        metas.head match {
          case meta if meta.ok =>
            val scale = math.min(1.0,
              math.min(maxW.toDouble / meta.width, maxH.toDouble / meta.height))
            val (w, h) = ((meta.width * scale).toInt.max(1), (meta.height * scale).toInt.max(1))
            val s = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
            val body = s.split("\\|", 5)(4)
            MediaRow(m.doc_id,
              s"$Magic|${meta.format}|$w|$h|$body".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          case _ => m // undecodable payloads pass through untouched
        }
      }))
  }

  // ------------------------------------------------------------ frame_sample

  case class Frame(doc_id: Long, frame_idx: Int, offset: Long, frame: Array[Byte])

  /** Frame sampling for "video" payloads: emit every `stride`-th fixed-size
    * chunk of the body as a frame row. One input row fans out to ≤
    * `maxFrames` rows — the schema/partitioning shape of real video
    * sampling, with the chunker standing in for a demuxer.
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int,
      maxFrames: Int, batchSize: Int = 32): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { m =>
        val body = m.payload
        Iterator.from(0)
          .map(i => i * stride * frameBytes)
          .takeWhile(off => off + frameBytes <= body.length)
          .take(maxFrames)
          .zipWithIndex
          .map { case (off, idx) =>
            Frame(m.doc_id, idx, off.toLong, body.slice(off, off + frameBytes))
          }
      }))
  }
}
