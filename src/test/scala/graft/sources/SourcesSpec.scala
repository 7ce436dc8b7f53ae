package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("csv round-trips with an explicit schema (no inference pass)") {
    val dir = Files.createTempDirectory("csv").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "n_chars")
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = Sources.csv(spark, dir, schema)
    assert(back.schema === schema)
    assert(back.count() === docs.count())
    assert(back.agg(sum("n_chars")).head.getLong(0) ===
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("json round-trips with an explicit schema") {
    val dir = Files.createTempDirectory("json").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    docs.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val back = Sources.json(spark, dir, schema)
    assert(back.count() === docs.count())
    assert(back.filter(col("text").isNull).count() === 0)
  }

  test("partitioned parquet write prunes partitions for filters on the key") {
    val dir = Files.createTempDirectory("part").toString
    Sources.writePartitioned(Tables.documents(spark, sfDir), dir, "source")
    // hive-style layout: one directory per source value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("source=")) && dirs.length >= 2)
    val filtered = spark.read.parquet(dir).filter(col("source") === "src1")
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty, "filter on partition column must become a partition filter")
    assert(filtered.count() ===
      Tables.documents(spark, sfDir).filter(col("source") === "src1").count())
  }

  test("rowCountFromFooters counts nested/partitioned layouts and skips staging") {
    val root = Files.createTempDirectory("footers").toString
    val docs = Tables.documents(spark, sfDir)
    docs.write.partitionBy("source").parquet(s"$root/docs.parquet")
    // part files live one level down (source=...) — the footer count must
    // recurse, not silently return 0
    assert(Tables.rowCountFromFooters(spark, root, "docs") === docs.count())

    // hidden/staging segments (_temporary, .spark-staging-*) left by an
    // in-flight or failed write must NOT inflate the count — copy a real
    // part file under both and assert the count is unchanged
    val part = new java.io.File(s"$root/docs.parquet").listFiles()
      .filter(_.isDirectory).head.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val tmp = new java.io.File(s"$root/docs.parquet/_temporary/0")
    val staging = new java.io.File(s"$root/docs.parquet/.spark-staging-123")
    tmp.mkdirs(); staging.mkdirs()
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(tmp, "stale.parquet").toPath)
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(staging, "stale.parquet").toPath)
    assert(Tables.rowCountFromFooters(spark, root, "docs") === docs.count(),
      "staging leftovers must not count")

    // a present-but-empty dataset (marker files only) is a legitimate 0
    val empty = new java.io.File(s"$root/empty.parquet")
    empty.mkdirs()
    new java.io.File(empty, "_SUCCESS").createNewFile()
    assert(Tables.rowCountFromFooters(spark, root, "empty") === 0L)

    // a WRONG path still fails loud
    assertThrows[java.io.FileNotFoundException] {
      Tables.rowCountFromFooters(spark, root, "no_such_table")
    }
  }

  test("bucketed tables join with zero shuffle on either side") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val left = (1L to 500L).map(i => (i, s"u$i")).toDF("id", "url")
    val right = (1L to 500L).map(i => (i, i % 7)).toDF("id", "grp")
    Sources.writeBucketed(left, "bk_left", "id", 4)
    Sources.writeBucketed(right, "bk_right", "id", 4)
    try {
      // force a sort-merge join — a broadcast would hide the bucket
      // alignment (and BroadcastExchange contains "Exchange" too)
      val joined = spark.table("bk_left").hint("merge")
        .join(spark.table("bk_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-aligned join must not shuffle either side:\n$plan")
      assert(joined.count() == 500L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
