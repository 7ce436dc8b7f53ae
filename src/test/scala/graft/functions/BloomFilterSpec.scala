package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloom has no false negatives and bounded false positives") {
    val members = (1L to 2000L).map(i => s"https://site.eu/doc/$i")
    val bloomDf = members.toDF("url")
      .agg(BloomFns.bloom_build(xxhash64(col("url")), 2000, 0.01).as("bloom"))
    // every member probes true — the exactness half of the contract
    val misses = members.toDF("url").crossJoin(broadcast(bloomDf))
      .filter(!BloomFns.bloom_might_contain(xxhash64(col("url")), col("bloom")))
      .count()
    assert(misses == 0L, "a Bloom filter must never false-negative")
    // non-members probe mostly false; FP rate within 3x of the target
    val fresh = (1L to 20000L).map(i => s"https://other.eu/page/$i")
    val fps = fresh.toDF("url").crossJoin(broadcast(bloomDf))
      .filter(BloomFns.bloom_might_contain(xxhash64(col("url")), col("bloom")))
      .count()
    assert(fps < 20000 * 0.03, s"FP rate ${fps / 20000.0} should be near 0.01")
  }

  test("distributed build is partitioning-invariant (OR-merge is the agg)") {
    val df = (1L to 5000L).toDF("h")
    def build(parts: Int) = df.repartition(parts)
      .agg(BloomFns.bloom_build(col("h"), 5000, 0.01).as("bloom"))
      .head.getAs[Array[Byte]]("bloom")
    assert(java.util.Arrays.equals(build(1), build(32)),
      "partial blooms must OR-merge to identical bytes under any partitioning")
  }

  test("codegen probe agrees with the interpreted kernel") {
    val members = (1L to 500L).map(i => s"u$i")
    val bloom = members.toDF("url")
      .agg(BloomFns.bloom_build(xxhash64(col("url")), 500, 0.01).as("bloom"))
      .head.getAs[Array[Byte]]("bloom")
    val probes = (1L to 3000L).map(i => s"u$i")
    // DataFrame path (whole-stage codegen over the broadcast column)
    val viaDf = probes.toDF("url")
      .crossJoin(broadcast(Seq(Tuple1(bloom)).toDF("bloom")))
      .select(col("url"), BloomFns.bloom_might_contain(xxhash64(col("url")), col("bloom")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // interpreted kernel on the driver, same hashes
    val viaKernel = probes.toDF("url").select(col("url"), xxhash64(col("url")).as("h"))
      .collect().map(r => r.getString(0) -> BloomKernel.probe(bloom, r.getLong(1))).toMap
    assert(viaDf == viaKernel)
  }

  test("frontierBloom returns exactly the anti-join answer on adversarial overlap") {
    val candidates = (1L to 400L).map(i => (i, s"https://s.eu/$i")).toDF("doc_id", "url")
    // seen includes half the candidates PLUS urls outside the candidate set
    val seen = ((1L to 400L by 2).map(i => s"https://s.eu/$i") ++
      (1000L to 1500L).map(i => s"https://s.eu/$i")).toDF("url")
    val got = graft.operators.SyncOps.frontierBloom(candidates, seen, expectedSeen = 1000)
      .select("doc_id").as[Long].collect().toSet
    val want = candidates.join(seen, Seq("url"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(want == (2L to 400L by 2).toSet)
  }

  test("bloomParams computes sane textbook sizes") {
    val (bits, k) = BloomFns.bloomParams(1000000, 0.01)
    // ~9.6 bits/element, ~7 hashes at 1% FP
    assert(bits / 1000000.0 > 9 && bits / 1000000.0 < 11)
    assert(k >= 6 && k <= 8)
  }
}
