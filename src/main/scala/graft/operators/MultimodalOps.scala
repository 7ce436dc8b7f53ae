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
      if (parts.length == 5 && parts(0) == Magic && Formats.contains(parts(1)))
        MediaMeta(m.doc_id, parts(1), parts(2).toInt, parts(3).toInt, m.payload.length.toLong, ok = true)
      else
        MediaMeta(m.doc_id, "unknown", -1, -1, m.payload.length.toLong, ok = false)
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
}
