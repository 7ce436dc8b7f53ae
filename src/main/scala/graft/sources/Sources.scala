package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers with the engine's scale rules baked in:
  *
  *  - Schemas are EXPLICIT for csv/json. Schema inference reads the data
  *    twice — at 100 TB that is a full extra pass before the job starts.
  *  - Text formats never infer types; parquet stays the primary format
  *    (predicate + projection pushdown, column statistics).
  *  - Writes partition by the query-time filter columns so downstream scans
  *    prune whole directories (partition pruning beats row-group skipping).
  *
  * Scroll-export mapping (the reference's `get_docs`, dags/lib/elastic.py
  * :122): an ES scroll with a `_source` projection and a query filter is,
  * in Spark terms, `spark.read.parquet(...).select(cols).filter(pred)` —
  * the `_source` list becomes the pruned ReadSchema, the query becomes
  * PushedFilters, and scroll pagination disappears because partitions ARE
  * the pagination (each task streams its split; no server-side cursor
  * state). `PlanAuditSpec` asserts both pushdowns reach the scan, which is
  * why no dedicated operator exists for the export path.
  */
object Sources {

  /** CSV with explicit schema + header. `mode=FAILFAST` — silent row
    * corruption at scale is worse than a failed job.
    */
  def csv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  /** NDJSON with explicit schema (one JSON object per line). */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** Hive-style partitioned parquet write. Partition columns become
    * directories; a downstream filter on them prunes at planning time.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** WARC ingest (ISO 28500) — the archive format crawl corpora arrive in
    * at 100 TB (Common Crawl ships ~1 GB `.warc.gz` files). `binaryFile`
    * yields one row per file; [[graft.functions.WarcParse]] splits records
    * byte-exactly by Content-Length (never by scanning for `WARC/`), with
    * `.warc.gz` multi-member decompression via
    * [[graft.functions.Gunzip]] when `gzipped`.
    *
    * Output: one row per record — (path, warc_type, target_uri, warc_date,
    * content_type, content_length, http_status, payload).
    *
    * Scale: parallelism is per file — the ~1 GB WARC size cap exists
    * precisely so file count is the distribution unit (100 TB ≈ 100k files
    * ≈ 100k tasks, zero shuffle). `spark.sql.files.maxPartitionBytes` does
    * not split binaryFile rows, so task memory is bounded by the largest
    * file, not the total.
    */
  def readWarc(spark: SparkSession, path: String, gzipped: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    val raw = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val bytes =
      if (gzipped)
        GraftSqlBridge.column(graft.functions.Gunzip(
          GraftSqlBridge.expression(col("content"))))
      else col("content")
    raw
      .withColumn("rec", explode(GraftSqlBridge.column(
        graft.functions.WarcParse(GraftSqlBridge.expression(bytes)))))
      .select(col("path"), col("rec.*"))
  }

  /** WARC sink: one archive file per row — (file_key, warc bytes/string) as
    * produced by `SyncOps.assembleWarcFiles` — written via the Hadoop
    * FileSystem API from the EXECUTORS (foreachPartition: each task writes
    * its own files in parallel; nothing funnels through the driver), so the
    * same code targets local disk, HDFS, or an object store. Byte-exact:
    * no record separators or newlines are added — the framing is already
    * in the bytes ([[graft.operators.SyncOps.formatWarcRecords]]).
    */
  def writeWarc(files: DataFrame, dir: String,
      keyCol: String = "file_key", warcCol: String = "warc"): Unit = {
    import org.apache.spark.sql.functions.col
    val conf = new org.apache.spark.util.SerializableConfiguration(
      files.sparkSession.sparkContext.hadoopConfiguration)
    files.select(col(keyCol).cast("string"), col(warcCol).cast("binary"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(conf.value)
        rows.foreach { r =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(dir, r.getString(0) + ".warc"), true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
      }
  }

  /** Bucketed table write — the co-located-join contract at 100 TB: two
    * tables bucketed by the SAME key into the SAME bucket count join with
    * ZERO shuffle on either side (Spark plans bucket-to-bucket joins; the
    * exchange disappears — `SourcesSpec` asserts it). Bucket the big,
    * repeatedly-joined facts ONCE at ingest (`lineitem` by orderkey, docs
    * by host, embeddings by cluster cell) and every later join of the
    * pipeline runs shuffle-free.
    *
    * `sortBy` the same key so bucket files are internally ordered —
    * bucket + sort turns the join's sort phase into a merge as well.
    * Requires a table catalog (`saveAsTable`) because bucket metadata
    * lives there, not in the parquet footer.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
