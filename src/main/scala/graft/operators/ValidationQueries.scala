package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the "check the batch before
  * you publish it" step of an ingestion pipeline (the Deequ pattern):
  * a fixed set of constraints (uniqueness, completeness, range, domain,
  * format) all evaluated in ONE aggregation pass over the table, then
  * pivoted to a long-format report row per constraint.
  *
  * Scale shape: every constraint is an algebraic aggregate, so the
  * whole report is map-side-combinable partials collapsing to a single
  * row — no shuffle of the data at any corpus size (the one exact
  * count-distinct is itself a two-phase hash aggregate on the key).
  * The stack() pivot runs on that one row. Adding a constraint adds a
  * column to the aggregate, not a pass over the table.
  */
object ValidationQueries {

  /** Constraint report over `orders`: one row per check with the
    * satisfied/total counts, the satisfaction ratio, and the verdict.
    */
  def qDqReport(spark: SparkSession, sfDir: String): DataFrame =
    reportFrom(Tables.orders(spark, sfDir))

  /** DataFrame-core form (specs inject violations through this). */
  def reportFrom(orders: DataFrame): DataFrame = {
    val a = orders.agg(
      count(lit(1)).as("n"),
      count_distinct(col("o_orderkey")).as("uk"),
      count(col("o_custkey")).as("cc"),
      sum(when(col("o_totalprice") > 0, 1L).otherwise(0L)).as("pp"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("sd"),
      sum(when(col("o_orderpriority").rlike("^[1-5]-"), 1L).otherwise(0L)).as("pf"))
    a.select(
        expr("""stack(5,
          'orderkey_unique', uk,
          'custkey_complete', cc,
          'totalprice_positive', pp,
          'status_domain', sd,
          'priority_format', pf) as (check_name, satisfied)"""),
        col("n").as("total"))
      .withColumn("ratio",
        round(col("satisfied").cast("double") / col("total"), 6) + lit(0.0))
      .withColumn("passed", col("satisfied") === col("total"))
      .orderBy(asc_nulls_first("check_name"))
  }
}
