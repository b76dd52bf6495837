package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface: ranking (row_number / rank / dense_rank),
  * analytic (lag / lead), and explicit frame specs (running totals).
  * All windows partition by a key — WindowExec sorts within partitions
  * after a hash exchange on the partition key, so there is never a
  * single-partition global sort (the classic window-at-scale mistake of
  * an empty PARTITION BY).
  */
object WindowQueries {

  /** Per customer: top-3 orders by totalprice (row_number, rank,
    * dense_rank over the same ordering, tie-break orderkey).
    */
  def qWindowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .orderBy(asc_nulls_first("o_custkey"), col("rn").asc)
  }

  /** Per user over events in time order: previous / next value and the
    * delta to the previous. Deltas subtract the exact input doubles
    * (IEEE-deterministic, same in DuckDB) so no rounding is needed.
    */
  def qWindowAnalytic(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
      .orderBy(asc_nulls_first("user_id"), col("ts").asc, col("event_id").asc)
  }

  /** Trailing-30-day revenue per order via a RANGE frame over unix
    * micros: every order of the same customer whose date falls within
    * the preceding 30 days contributes — a value-based frame, not a
    * row-count one, so no tie-break is needed for frame membership
    * (equal-time rows share the identical frame in both engines). The
    * sum accumulates in DECIMAL(18,2), exact at any frame.
    */
  def qWindowRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("od_us"))
      .rangeBetween(-30L * dayUs, 0L)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      .withColumn("trailing_30d_revenue",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        "trailing_30d_revenue")
      .orderBy(asc_nulls_first("o_custkey"), col("o_orderdate").asc,
        col("o_orderkey").asc)
  }

  /** Running revenue per customer over orders by (orderdate, orderkey)
    * with an explicit ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    * frame. The running sum accumulates in DECIMAL(18,2) — exact at any
    * prefix — then casts to double, so it matches the oracle regardless
    * of either engine's internal frame-evaluation strategy.
    */
  def qWindowFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_revenue",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .orderBy(asc_nulls_first("o_custkey"), col("o_orderdate").asc, col("o_orderkey").asc)
  }

  /** Distribution window functions — quartile assignment (ntile),
    * percent_rank and cume_dist per customer within a market segment.
    * The window ordering includes the unique c_custkey, so there are
    * never ties: percent_rank = (rn−1)/(n−1) and cume_dist = rn/n are
    * single IEEE divisions of exact integers in both engines, rounded
    * to 6 dp for the compare.
    */
  def qWindowDist(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6) + lit(0.0))
      .withColumn("cume", round(cume_dist().over(w), 6) + lit(0.0))
      .orderBy(asc_nulls_first("c_mktsegment"), col("c_acctbal").asc,
        col("c_custkey").asc)
  }
}
