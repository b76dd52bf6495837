package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2.3 for the query
  * inventory. Every entry in `queries` has a matching DuckDB oracle in
  * `oracleSql` with IDENTICAL output column names (the driver's compare
  * sorts columns by name before hashing). Every query is deterministic:
  * full ORDER BY, floats rounded to 6 dp, session timezone UTC.
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
  )
}
