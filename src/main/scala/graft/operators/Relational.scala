package graft.operators

import graft.Tables
import graft.functions.NumFns.roundHalfUp
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational / query core — the ES-style analytics the reference runs over
  * its document corpus (terms + stats aggregations, filter context, sort+size,
  * cardinality aggs, multi-level facets), expressed over the star schema.
  *
  * Design for scale: aggregations are plain `groupBy` (map-side partial agg +
  * one shuffle); dimension joins broadcast the small side explicitly; window
  * operators partition by a high-cardinality key so no single partition holds
  * more than one key-group's rows; every float aggregate is rounded so results
  * are order-independent for the correctness gate.
  */
object Relational {

  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Pricing-summary aggregation (ES terms+stats agg twin; TPC-H Q1 shape). */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        roundHalfUp(sum("l_quantity"), 2).as("sum_qty"),
        roundHalfUp(sum("l_extendedprice"), 2).as("sum_base_price"),
        roundHalfUp(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        roundHalfUp(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue by nation: 5-way join with broadcast dims (TPC-H Q5 shape). */
  def q2Join(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d).filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
    val cust = Tables.customer(s, d)
    val nat = broadcast(Tables.nation(s, d))
    val reg = broadcast(Tables.region(s, d).filter(col("r_name").isin("EUROPE", "ASIA")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(
        roundHalfUp(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** Top-k orders by revenue (ES sort+size over an agg). */
  def q3TopK(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(roundHalfUp(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)

  /** Window functions: top-3 orders per customer with running total. */
  def q4Window(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables
      .orders(s, d)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        row_number().over(w).cast("long").as("rnk"),
        roundHalfUp(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("run_total"))
      .filter(col("rnk") <= 3)
      .orderBy("o_custkey", "rnk")
  }

  /** EXISTS semi-join: customers with at least one urgent order. */
  def q5SemiJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    Tables
      .customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** NOT EXISTS anti-join: customers with no urgent order (ES must_not). */
  def q6AntiJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    Tables
      .customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Exact distinct-count aggregations (ES cardinality agg). */
  def q7Distinct(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))

  /** ROLLUP facet tree (ES multi-level terms agg). */
  def q8Rollup(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(
        // grouping()==1 marks subtotal rows — unlike coalesce, this stays
        // correct if the data ever contains genuine NULL status/priority.
        when(grouping(col("o_orderstatus")) === 1, "ALL")
          .otherwise(col("o_orderstatus")).as("status"),
        when(grouping(col("o_orderpriority")) === 1, "ALL")
          .otherwise(col("o_orderpriority")).as("priority"),
        count(lit(1)).as("n"),
        roundHalfUp(sum("o_totalprice"), 2).as("total"))
      .select("status", "priority", "n", "total")
      .orderBy("status", "priority")

  /** Event-time tumbling-window aggregation — the batch twin of
    * `StreamOps.windowCounts`, factored over an arbitrary events frame so
    * the stream/batch parity spec can run BOTH paths on the same rows
    * (including decimal-tie sums, where only the shared roundHalfUp keeps
    * the two equal).
    */
  def eventWindows(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), roundHalfUp(sum("value"), 2).as("total"))
      .select(fmtTs(col("win")).as("window_start"), col("event_type"), col("n"), col("total"))

  def q9EventWindows(s: SparkSession, d: String): DataFrame =
    eventWindows(Tables.events(s, d))
      .orderBy("window_start", "event_type")

  /** Sessionization: 30-min-gap sessions via lag + running sum of boundaries.
    * Partitioned by user — scales linearly in users; no global sort.
    */
  def q10Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapSec = 30 * 60
    Tables
      .events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn(
        "is_new",
        // Interval arithmetic works for BOTH TimestampType and
        // TIMESTAMP_NTZ (unlike `unix_micros`, which is type-strict and
        // rejects NTZ) — no operator here depends on the physical
        // timestamp flavor the parquet reader happened to infer.
        when(
          col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr(s"INTERVAL $gapSec SECONDS"),
          1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        fmtTs(min("ts")).as("session_start"),
        fmtTs(max("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** Sessionization via Spark's built-in `session_window` — the idiomatic
    * formulation of q10's lag+cumsum sessions (both must agree; the oracle
    * cross-checks them against the same DuckDB session derivation). The
    * built-in merges per-key windows inside the aggregation, so the shuffle
    * is the groupBy's only one and state never exceeds open sessions.
    */
  def q13SessionWindow(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min("ts").as("start_ts"))
      .select(
        col("user_id"),
        fmtTs(col("start_ts")).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** Revenue by part type and supplier nation: fact table joined to two
    * broadcast dims (part, supplier) plus nation — the classic star-join
    * shape where the fact side never shuffles for the dimension lookups
    * (TPC-H Q9 flavor; ES nested terms agg twin).
    */
  def q12PartTypeRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val part = broadcast(Tables.part(s, d).filter(col("p_size") <= 25))
    val supp = broadcast(Tables.supplier(s, d))
    val nat = broadcast(Tables.nation(s, d))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy("p_type", "n_name")
      .agg(
        roundHalfUp(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_type", "n_name")
  }

  /** As-of join: each purchase event joined to the user's latest prior
    * view/click event. Implemented with the scalable union+window trick —
    * one shuffle on the key, no point-in-time cross join. Ties at equal `ts`
    * resolve to the reference side (views sort before purchases), then to the
    * largest event id.
    */
  def q11AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("kind"), col("event_id"),
        lit(null).cast("long").as("r_event_id"))
    val views = ev
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), lit(0).as("kind"), lit(null).cast("long").as("event_id"),
        col("event_id").as("r_event_id"))
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("kind"), col("r_event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases
      .unionByName(views)
      .withColumn("prior_view_event_id", last("r_event_id", ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("prior_view_event_id").isNotNull)
      .select("event_id", "user_id", "prior_view_event_id")
      .orderBy("event_id")
  }
}
