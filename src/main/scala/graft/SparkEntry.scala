package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  *
  * Each `queries` entry is one operator from the inventory; `oracleSql` holds
  * the DuckDB-runnable ANSI twin (same column names, float aggregates rounded
  * identically on both sides so results are order-independent).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational / query core (SURVEY §2 #1-#11)
    "q1_agg" -> (Relational.q1Agg _),
    "q2_join" -> (Relational.q2Join _),
    "q3_topk" -> (Relational.q3TopK _),
    "q4_window" -> (Relational.q4Window _),
    "q5_semijoin" -> (Relational.q5SemiJoin _),
    "q6_antijoin" -> (Relational.q6AntiJoin _),
    "q7_distinct" -> (Relational.q7Distinct _),
    "q8_rollup" -> (Relational.q8Rollup _),
    "q9_event_windows" -> (Relational.q9EventWindows _),
    "q10_sessionize" -> (Relational.q10Sessionize _),
    "q11_asof_join" -> (Relational.q11AsofJoin _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey=o_orderkey
        | JOIN customer ON o_custkey=c_custkey
        | JOIN nation ON c_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND r_name IN ('EUROPE','ASIA')
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_window" ->
      """SELECT o_custkey, o_orderkey, rnk, run_total FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS UNBOUNDED PRECEDING),2) AS run_total
        | FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q5_semijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey=c_custkey AND o_orderpriority='1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q6_antijoin" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey=c_custkey AND o_orderpriority='1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q7_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        | count(DISTINCT o_orderpriority) AS n_prio,
        | count(*) AS n_orders
        |FROM orders""".stripMargin,
    "q8_rollup" ->
      """SELECT CASE WHEN GROUPING(o_orderstatus)=1 THEN 'ALL' ELSE o_orderstatus END AS status,
        | CASE WHEN GROUPING(o_orderpriority)=1 THEN 'ALL' ELSE o_orderpriority END AS priority,
        | count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q9_event_windows" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, count(*) AS n, round(sum(value),2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q10_sessionize" ->
      """WITH marked AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        | SELECT user_id, ts,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        | FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q11_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
        | v AS (
        |  SELECT event_id AS prior_view_event_id, user_id, ts FROM events
        |  WHERE event_type IN ('view','click')),
        | j AS (
        |  SELECT p.event_id, p.user_id, v.prior_view_event_id,
        |   row_number() OVER (PARTITION BY p.event_id
        |     ORDER BY v.ts DESC, v.prior_view_event_id DESC) AS rn
        |  FROM p JOIN v ON p.user_id=v.user_id AND v.ts <= p.ts)
        |SELECT event_id, user_id, prior_view_event_id FROM j WHERE rn=1
        |ORDER BY event_id""".stripMargin
  )
}
