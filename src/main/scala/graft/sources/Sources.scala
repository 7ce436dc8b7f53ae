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
}
