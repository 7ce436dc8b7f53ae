package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Bulk-NDJSON writer — the Spark twin of the reference's RabbitMQ →
  * Logstash → Elasticsearch hand-off (logstash/pipeline/search_pipeline.conf).
  *
  * Input: a DataFrame with `action` and `source` string columns (see
  * `SearchOps.esBulkFormat`). Each row becomes the canonical two-line bulk
  * unit; each Spark partition writes one `part-*` file, so a 1000-executor
  * job emits 1000 independent bulk bodies that can be POSTed to `_bulk`
  * concurrently — the parallelism story Logstash workers provided, without a
  * driver-side bottleneck (no collect, the text writer streams from the
  * partitions).
  */
object EsBulkSink {

  /** Write `action`/`source` pairs as NDJSON text files, `numFiles` part
    * files (≈ one per concurrent bulk POST the downstream can absorb).
    */
  def write(bulk: DataFrame, outDir: String, numFiles: Int = 0): DataFrame = {
    val lines = bulk.select(
      concat_ws("\n", col("action"), col("source")).as("value"))
    val sized = if (numFiles > 0) lines.repartition(numFiles) else lines
    sized.write.mode(SaveMode.Overwrite).text(outDir)
    lines
  }
}
