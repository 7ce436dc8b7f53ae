package graft.functions

import graft.{SparkSpec, Tables}
import graft.functions.BottomKSample.bottom_k_sample
import org.apache.spark.sql.functions._

class BottomKSampleSpec extends SparkSpec {

  private def sampleWith(parts: Int): Seq[Long] =
    Tables.documents(spark, sfDir)
      .repartition(parts)
      .agg(bottom_k_sample(col("doc_id"), 20).as("sample"))
      .collect()(0).getSeq[Long](0)

  test("sample is deterministic and independent of partitioning") {
    val a = sampleWith(1)
    val b = sampleWith(7)
    val c = sampleWith(32)
    assert(a.size === 20)
    assert(a === b && b === c, "merge must be order/partitioning independent")
  }

  test("sample matches the brute-force bottom-k of the same hash") {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val ids = Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = ids.sortBy(mix).take(20).toSeq
    assert(sampleWith(4) === expected)
  }

  test("k larger than the input returns everything") {
    val spark2 = spark
    import spark2.implicits._
    val got = Seq(1L, 2L, 3L).toDF("id")
      .agg(bottom_k_sample(col("id"), 10)).collect()(0).getSeq[Long](0)
    assert(got.toSet === Set(1L, 2L, 3L))
  }
}
