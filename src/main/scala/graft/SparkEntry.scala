package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2.3 for the query
  * inventory. Every entry in `queries` has a matching DuckDB oracle in
  * `oracleSql` with IDENTICAL output column names (the driver's compare
  * sorts columns by name before hashing). Every query is deterministic:
  * full ORDER BY (explicit NULLS FIRST in the oracle, Spark's asc
  * default), floats rounded to 6 dp or exact-by-construction
  * (DECIMAL-cast sums of 2-dp monetary doubles), session timezone UTC.
  */
object SparkEntry {

  /** Flagship query (the reference's wc app) on sf0.001; driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.qWordcount(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_project"    -> (CoreQueries.qScanProject _),
    "q_filter"          -> (CoreQueries.qFilter _),
    "q_wordcount"       -> (CoreQueries.qWordcount _),
    "q_inverted_index"  -> (CoreQueries.qInvertedIndex _),
    "q_join_inner"      -> (JoinQueries.qJoinInner _),
    "q_join_broadcast"  -> (JoinQueries.qJoinBroadcast _),
    "q_join_left"       -> (JoinQueries.qJoinLeft _),
    "q_join_semi"       -> (JoinQueries.qJoinSemi _),
    "q_join_anti"       -> (JoinQueries.qJoinAnti _),
    "q_join_range"      -> (JoinQueries.qJoinRange _),
    "q_join_asof"       -> (JoinQueries.qJoinAsof _),
    "q_agg_hash"        -> (AggQueries.qAggHash _),
    "q_agg_distinct"    -> (AggQueries.qAggDistinct _),
    "q_agg_rollup"      -> (AggQueries.qAggRollup _),
    "q_agg_cube"        -> (AggQueries.qAggCube _),
    "q_topk"            -> (AggQueries.qTopk _),
    "q_set_union"       -> (AggQueries.qSetUnion _),
    "q_set_intersect"   -> (AggQueries.qSetIntersect _),
    "q_set_except"      -> (AggQueries.qSetExcept _),
    "q_window_rank"     -> (WindowQueries.qWindowRank _),
    "q_window_analytic" -> (WindowQueries.qWindowAnalytic _),
    "q_window_frame"    -> (WindowQueries.qWindowFrame _),
  )

  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |LIMIT 1000""".stripMargin,
    "q_filter" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_returnflag IN ('A','R')
        |  AND l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
        |  AND l_linestatus LIKE 'F%'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |  FROM documents) t
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "q_inverted_index" ->
      """SELECT word, count(DISTINCT doc_id) AS n_docs,
        |       string_agg(DISTINCT CAST(doc_id AS VARCHAR), ','
        |                  ORDER BY CAST(doc_id AS VARCHAR)) AS doc_ids
        |FROM (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |  FROM documents) t
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "q_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS n_lines,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name NULLS FIRST""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,
    "q_join_range" ->
      """SELECT s_nationkey AS nationkey, count(*) AS n_pairs
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND abs(s_acctbal - c_acctbal) < 100.0
        |GROUP BY 1 ORDER BY nationkey NULLS FIRST""".stripMargin,
    "q_join_asof" ->
      """SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1 ORDER BY event_id NULLS FIRST""".stripMargin,
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) + 0.0 AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_agg_distinct" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
        |  count(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment NULLS FIRST""".stripMargin,
    "q_agg_rollup" ->
      """SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS INT) AS gid,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY gid ASC, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid ASC, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q_set_union" ->
      """SELECT nationkey, CAST(count(*) AS INT) AS n_sources FROM (
        |  SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |  UNION ALL
        |  SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier) t
        |GROUP BY nationkey ORDER BY nationkey NULLS FIRST""".stripMargin,
    "q_set_intersect" ->
      """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
        |ORDER BY nationkey NULLS FIRST""".stripMargin,
    "q_set_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT user_id AS custkey FROM events
        |ORDER BY custkey NULLS FIRST""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey ASC)) t
        |WHERE rn <= 3 ORDER BY o_custkey NULLS FIRST, rn ASC""".stripMargin,
    "q_window_analytic" ->
      """SELECT user_id, event_id, ts, value,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  value - lag(value) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id NULLS FIRST, ts ASC, event_id ASC""".stripMargin,
    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_revenue
        |FROM orders
        |ORDER BY o_custkey NULLS FIRST, o_orderdate ASC, o_orderkey ASC""".stripMargin,
  )
}
