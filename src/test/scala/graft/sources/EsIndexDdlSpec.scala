package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

class EsIndexDdlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("title", StringType),
    StructField("issued", TimestampType),
    StructField("score", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("embedding", ArrayType(FloatType))))

  test("mappingProperties derives ES field types from the Spark schema") {
    val got = EsIndexDdl.mappingProperties(
      schema, keywordCols = Set("lang"), embeddingCol = Some("embedding"))
    assert(got ==
      """{"doc_id":{"type":"long"},""" +
      """"lang":{"type":"keyword"},""" +
      """"title":{"type":"text","fields":{"keyword":{"type":"keyword","ignore_above":256}}},""" +
      """"issued":{"type":"date"},""" +
      """"score":{"type":"double"},""" +
      """"tags":{"type":"text","fields":{"keyword":{"type":"keyword","ignore_above":256}}},""" +
      """"embedding":{"type":"dense_vector","dims":768}}""")
  }

  test("createIndexBody assembles mappings + settings like create_index") {
    val got = EsIndexDdl.createIndexBody(
      StructType(Seq(StructField("id", LongType))),
      settings = Seq("index.number_of_shards" -> "1",
        "index.number_of_replicas" -> "0"))
    assert(got ==
      """{"mappings":{"properties":{"id":{"type":"long"}}},""" +
      """"settings":{"index.number_of_shards":1,"index.number_of_replicas":0}}""")
  }

  test("the dense_vector toggle is off unless requested, dims adjustable") {
    val s = StructType(Seq(StructField("embedding", ArrayType(FloatType))))
    assert(EsIndexDdl.mappingProperties(s) == """{"embedding":{"type":"float"}}""")
    assert(EsIndexDdl.mappingProperties(s, embeddingCol = Some("embedding"),
      embeddingDims = 384) ==
      """{"embedding":{"type":"dense_vector","dims":384}}""")
  }

  test("blockWrite emits the rollover settings bodies verbatim") {
    assert(EsIndexDdl.blockWrite(true) == """{"settings":{"index.blocks.write":true}}""")
    assert(EsIndexDdl.blockWrite(false) == """{"settings":{"index.blocks.write":false}}""")
  }

  test("structs are rejected with a flatten hint; output is deterministic") {
    val nested = StructType(Seq(StructField("s",
      StructType(Seq(StructField("x", LongType))))))
    val e = intercept[IllegalArgumentException] {
      EsIndexDdl.mappingProperties(nested)
    }
    assert(e.getMessage.contains("flatten"))
    // byte-determinism: same schema, same string
    assert(EsIndexDdl.mappingProperties(schema) == EsIndexDdl.mappingProperties(schema))
  }
}
