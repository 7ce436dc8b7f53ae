package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Timestamped snapshot store with keep-last-N retention — the Spark twin of
  * the reference's index backup/rotation machinery (dags/lib/elastic.py:75
  * `backup_index` clone + backups alias, :84 `update_index_ts` timestamp
  * alias, :103 `backup_indices` per-sync rotation, :206
  * `delete_old_indeces_for_index` keep-last-N retention).
  *
  * Mapping: an ES index clone becomes a parquet write under
  * `snapshot_ts=<ts>`; the "updated_at_<ts>" alias becomes the greatest
  * partition value; retention deletes all but the newest `keep` partitions.
  * Timestamps are zero-padded in the directory name so lexicographic order
  * equals chronological order — the alias trick without a metastore, and the
  * layout any Hive-partition-aware reader (or `spark.read.parquet(outDir)`
  * with partition discovery) understands.
  *
  * Scale: a snapshot write is one pass over the table with no shuffle;
  * listing and pruning touch only directory metadata, never data files.
  */
object SnapshotStore {
  private val Prefix = "snapshot_ts="

  def snapshotPath(outDir: String, ts: Long): String = f"$outDir/$Prefix$ts%020d"

  /** Clone the current table state as a new timestamped snapshot
    * (backup_index, elastic.py:75). Returns the snapshot directory.
    */
  def write(df: DataFrame, outDir: String, ts: Long): String = {
    val p = snapshotPath(outDir, ts)
    df.write.mode("overwrite").parquet(p)
    p
  }

  /** All snapshot timestamps, newest first (the creation-date sort of
    * get_backups_for_index, elastic.py:195).
    */
  def list(spark: SparkSession, outDir: String): Seq[Long] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(Prefix))
      // toLongOption, not toLong: a stray dir with the prefix but a
      // non-numeric suffix (a manual .bak copy, a partial upload) must not
      // take down list/prune/readLatest for the healthy snapshots
      .flatMap(s => s.getPath.getName.stripPrefix(Prefix).toLongOption)
      .sorted(Ordering[Long].reverse)
  }

  /** Keep-last-N retention (delete_old_indeces_for_index, elastic.py:206):
    * drop everything past the newest `keep` snapshots and return the dropped
    * timestamps. `keep` is clamped to ≥ 1 — the newest snapshot is never
    * deleted, so a bad retention config cannot erase the only good copy.
    */
  def prune(spark: SparkSession, outDir: String, keep: Int): Seq[Long] = {
    val victims = list(spark, outDir).drop(math.max(1, keep))
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    victims.foreach(ts => fs.delete(new Path(snapshotPath(outDir, ts)), true))
    victims
  }

  /** Read the newest snapshot — the "updated_at_<ts>" alias read path. */
  def readLatest(spark: SparkSession, outDir: String): DataFrame = {
    val all = list(spark, outDir)
    require(all.nonEmpty, s"no snapshots under $outDir")
    spark.read.parquet(snapshotPath(outDir, all.head))
  }
}
