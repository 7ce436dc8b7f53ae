package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("approx count-distinct (ES cardinality agg) tracks the exact count within 5%") {
    val r = Tables.orders(spark, sfDir)
      .agg(
        countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey")).as("approx"),
        approx_count_distinct(col("o_custkey"), 0.01).as("approx_tight"))
      .collect()(0)
    val exact = r.getAs[Long]("exact").toDouble
    assert(math.abs(r.getAs[Long]("approx") - exact) / exact <= 0.05)
    assert(math.abs(r.getAs[Long]("approx_tight") - exact) / exact <= 0.02)
  }

  test("as-of join resolves equal-timestamp ties to the latest prior event id") {
    import spark.implicits._
    // user 1: views at t0 (ids 10, 11) and a purchase at the SAME t0 (id 20):
    // the as-of pick must be the larger view id 11, mirroring the oracle's
    // ORDER BY ts DESC, id DESC.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 11:00:00")
    val ev = Seq(
      (10L, t0, 1L, "view", 0.0, "{}"),
      (11L, t0, 1L, "view", 0.0, "{}"),
      (20L, t0, 1L, "purchase", 9.9, "{}"),
      (21L, t1, 1L, "purchase", 9.9, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("asof").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.q11AsofJoin(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(20L -> 11L, 21L -> 11L))
  }
}
