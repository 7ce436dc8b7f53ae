package graft.sources

import graft.SparkSpec
import graft.operators.SearchOps
import graft.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EsBulkSinkSpec extends SparkSpec {

  test("bulk NDJSON round-trips: 2 lines per doc, actions parse, ids match") {
    val out = Files.createTempDirectory("esbulk").toString
    val docJson = concat(
      lit("""{"doc_id":"""), col("doc_id"),
      lit(""","lang":""""), col("lang"), lit("\"}"))
    val bulk = SearchOps.esBulkFormat(
      Tables.documents(spark, sfDir).withColumn("doc_json", docJson),
      indexName = "documents", idCol = "doc_id",
      updateOnly = col("doc_id") % 10 === 0)
    EsBulkSink.write(bulk, out, numFiles = 4)

    val lines = spark.read.text(out).collect().map(_.getString(0))
    val nDocs = bulk.count()
    // each row wrote "action\nsource" into one text value -> 2 physical lines
    assert(lines.length === 2 * nDocs)
    val actions = lines.filter(l => l.startsWith("{\"index\"") || l.startsWith("{\"update\""))
    assert(actions.length === nDocs)
    // update routing: exactly the doc_id % 10 == 0 docs
    val nUpdates = actions.count(_.startsWith("{\"update\""))
    assert(nUpdates === bulk.filter(col("doc_id") % 10 === 0).count())
    // one part file per requested partition
    val parts = new java.io.File(out).listFiles().count(_.getName.startsWith("part-"))
    assert(parts === 4)
  }
}
