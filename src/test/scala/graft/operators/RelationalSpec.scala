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

  test("exact-30-min gaps: both SHIPPED sessionizers continue the session (no boundary divergence)") {
    import spark.implicits._
    // The suspected divergence between the two registered sessionizers does
    // NOT exist: q10's strictly-greater gap test keeps an event landing
    // EXACTLY 30 min after its predecessor in the same session, and
    // session_window merges touching windows too (its session end is
    // inclusive for merging), so both agree even on boundary gaps.
    // Routed through the PRODUCTION operators on a temp events parquet —
    // an inline re-derivation here would keep passing even if
    // Relational.scala's interval-based gap expression regressed.
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    val evts = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(30), 1L, "view", 0.0, "{}"),
      (3L, ts(120), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("boundary").toString
    evts.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val q10 = Relational.q10Sessionize(spark, dir)
      .select("session_id", "n_events")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q10 === Map(1L -> 2L, 2L -> 1L),
      "q10: the boundary event must CONTINUE session 1 (strictly-greater gap test)")
    val q13 = Relational.q13SessionWindow(spark, dir)
      .select("n_events").collect().map(_.getLong(0)).toSeq.sorted
    assert(q13 === Seq(1L, 2L),
      "q13: session_window also continues at the exact boundary")
    // The companion testdata contract (generated events never land exactly
    // on the boundary, so the shared DuckDB oracle can adjudicate q10/q13)
    // lives in tools/selfcheck.py (check_events_no_boundary_gap) — the
    // oracle harness owns the testdata's guarantees; this spec owns the
    // production operators' behavior.
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
