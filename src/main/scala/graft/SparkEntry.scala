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
    "q11_asof_join" -> (Relational.q11AsofJoin _),
    // Crawl/sync pipeline semantics (SURVEY §2 #12-#16)
    "sync_diff" -> (SyncOps.qSyncDiff _),
    "crawl_frontier" -> (SyncOps.qCrawlFrontier _),
    "mark_redirects" -> (SyncOps.qMarkRedirects _),
    "error_retry" -> (SyncOps.qErrorRetry _),
    "delete_threshold" -> (SyncOps.qDeleteThreshold _)
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
        |ORDER BY event_id""".stripMargin,
    "sync_diff" ->
      """WITH crawled AS (
        |  SELECT o_orderkey AS id,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_orderdate + INTERVAL 1 DAY
        |         ELSE o_orderdate END AS modified
        |  FROM orders WHERE o_orderkey % 13 <> 0),
        |indexed AS (
        |  SELECT o_orderkey AS id, o_orderdate AS modified,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END AS error_cnt
        |  FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT coalesce(c.id, i.id) AS id,
        |  CASE WHEN i.id IS NULL THEN 'new'
        |       WHEN c.id IS NULL THEN 'deleted'
        |       WHEN c.modified = i.modified AND i.error_cnt = 0 THEN 'unchanged'
        |       ELSE 'modified' END AS status
        |FROM crawled c FULL OUTER JOIN indexed i ON c.id = i.id
        |ORDER BY id""".stripMargin,
    "crawl_frontier" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.eu/docs/' || CAST(doc_id % 37 AS VARCHAR) ||
        |    (['.html','','.pdf','.php','.aspx','','.gif','.jpg','.png','.svg'])[CAST(doc_id % 10 AS INT) + 1] AS url
        |  FROM documents),
        |dedup AS (SELECT url, min(doc_id) AS id FROM urls GROUP BY url),
        |enriched AS (
        |  SELECT id, url,
        |    regexp_replace(url, '^https?://[^/]+', '') AS path,
        |    lower(regexp_extract(url, '\.([A-Za-z0-9]+)$', 1)) AS ext
        |  FROM dedup)
        |SELECT id, url FROM enriched
        |WHERE ext NOT IN ('png','svg','jpg','gif','eps','jpeg')
        |  AND path NOT IN ('/docs/5','/docs/15.php')
        |  AND NOT EXISTS (SELECT 1 FROM (VALUES ('/docs/1'),('/docs/33')) r(p)
        |                  WHERE starts_with(path, p))
        |ORDER BY id, url""".stripMargin,
    "mark_redirects" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN 'redirected'
        |         WHEN doc_id % 17 = 0 THEN 'manual' END AS ex
        |  FROM documents),
        |fstat AS (SELECT doc_id, doc_id % 7 = 0 AS redirected FROM documents)
        |SELECT d.doc_id, TRUE AS update_only,
        |  CASE WHEN f.redirected THEN 'redirected' END AS exclude_from_globalsearch
        |FROM docs d JOIN fstat f USING (doc_id)
        |WHERE NOT (d.ex IS NOT NULL AND d.ex <> 'redirected')
        |  AND f.redirected <> coalesce(d.ex = 'redirected', FALSE)
        |ORDER BY doc_id""".stripMargin,
    "error_retry" ->
      """WITH cur AS (SELECT DISTINCT user_id AS id FROM events WHERE event_type='error'),
        |prior AS (
        |  SELECT id, id % 5 AS error_cnt, id % 3 AS skip_cnt
        |  FROM (SELECT DISTINCT user_id AS id FROM events) WHERE id % 2 = 0)
        |SELECT coalesce(c.id, p.id) AS id,
        |  CASE WHEN c.id IS NULL THEN 'dropped'
        |       WHEN p.id IS NULL THEN 'retry'
        |       WHEN p.error_cnt < 3 THEN 'retry'
        |       WHEN p.skip_cnt < 2 THEN 'skip'
        |       ELSE 'reset' END AS action,
        |  CASE WHEN c.id IS NULL THEN NULL
        |       WHEN p.id IS NULL THEN 1
        |       WHEN p.error_cnt < 3 THEN p.error_cnt + 1
        |       WHEN p.skip_cnt < 2 THEN p.error_cnt
        |       ELSE NULL END AS error_cnt,
        |  CASE WHEN c.id IS NULL THEN NULL
        |       WHEN p.id IS NULL THEN 0
        |       WHEN p.error_cnt < 3 THEN p.skip_cnt
        |       WHEN p.skip_cnt < 2 THEN p.skip_cnt + 1
        |       ELSE NULL END AS skip_cnt
        |FROM cur c FULL OUTER JOIN prior p ON c.id = p.id
        |ORDER BY id""".stripMargin,
    "delete_threshold" ->
      """WITH prev AS (SELECT doc_id AS id, source FROM documents),
        |cur AS (SELECT * FROM prev WHERE id % 10 <> 0 AND NOT (source='src3' AND id % 2 = 0)),
        |p AS (SELECT source, count(*) AS prev_cnt FROM prev GROUP BY source),
        |k AS (SELECT source, count(*) AS kept_cnt FROM cur GROUP BY source)
        |SELECT p.source, p.prev_cnt, coalesce(k.kept_cnt, 0) AS kept_cnt,
        |  p.prev_cnt - coalesce(k.kept_cnt, 0) AS to_delete,
        |  round((p.prev_cnt - coalesce(k.kept_cnt, 0)) * 100.0 / p.prev_cnt, 4) AS delete_pct,
        |  round((p.prev_cnt - coalesce(k.kept_cnt, 0)) * 100.0 / p.prev_cnt, 4) > 25.0 AS should_abort
        |FROM p LEFT JOIN k USING (source)
        |ORDER BY source""".stripMargin
  )
}
