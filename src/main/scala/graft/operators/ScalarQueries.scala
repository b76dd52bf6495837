package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-expression surface: string, date/time, math, conditional,
  * JSON, and array/higher-order functions. All built-ins from
  * `org.apache.spark.sql.functions` — codegen'd Catalyst expressions that
  * stay inside WholeStageCodegen (no UDFs anywhere; the reference's only
  * scalar surface is app code inside its map/reduce plugins,
  * `/root/reference/mrapps/wc.go:21-34`).
  *
  * Determinism: per-row outputs are functions of the row, so each query
  * orders by every source column its outputs depend on before LIMIT;
  * rounded signed doubles get `+ 0.0` to normalize IEEE −0.0 (Spark's
  * BigDecimal HALF_UP rounding yields +0.0 where C-library rounding
  * keeps the sign bit).
  */
object ScalarQueries {

  /** String functions over part. regexp_extract: Java and RE2 dialects
    * agree on this anchored lowercase pattern.
    */
  def qScalarString(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_type"), 1, 3).as("type_prefix"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("name_underscored"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        trim(col("p_name")).as("name_trim"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"))
      .orderBy(asc_nulls_first("p_partkey"))
      .limit(1000)

  /** Date/time functions over orders: component extraction, month
    * truncation, day distance to a fixed reference date.
    */
  def qScalarDate(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        // trunc() (DateType) not date_trunc() (TimestampType): DuckDB's
        // date_trunc('month', ts) yields a DATE, so match that type.
        trunc(col("o_orderdate"), "month").as("month_start"),
        datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate"))).as("days_to_ref"))
      .orderBy(asc_nulls_first("o_orderkey"))
      .limit(1000)

  /** Math functions over lineitem. ceil/floor are cast to BIGINT on the
    * oracle side (DuckDB keeps them DOUBLE, Spark returns LONG);
    * sqrt is IEEE-exact, ln/pow agree well inside 6-dp rounding.
    * ORDER BY covers every input column the outputs depend on, so the
    * LIMIT is deterministic.
    */
  def qScalarMath(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"),
        (round(sqrt(col("l_quantity")), 6) + lit(0.0)).as("qty_sqrt"),
        (round(log(col("l_extendedprice")), 6) + lit(0.0)).as("price_ln"),
        (round(pow(col("l_discount"), 2), 6) + lit(0.0)).as("disc_sq"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        abs(col("l_quantity") - lit(25.0)).as("qty_dev"),
        (col("l_orderkey") % 7).as("okey_mod7"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .limit(1000)

  /** CASE WHEN price bands over orders, then counts and exact decimal
    * revenue per band.
    */
  def qScalarCase(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        when(col("o_totalprice") < 100000.0, "low")
          .when(col("o_totalprice") < 300000.0, "mid")
          .otherwise("high").as("band"),
        col("o_totalprice"))
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(asc_nulls_first("band"))

  /** JSON extraction from events.props (`{"k": 87}`) with per-type
    * stats. get_json_object is Spark's codegen'd JSON path evaluator;
    * avg divides exact integer sums in double (deterministic).
    */
  def qScalarJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        (round(sum(col("k")).cast("double") / count(col("k")), 6) + lit(0.0)).as("avg_k"))
      .orderBy(asc_nulls_first("event_type"))

  /** Array/higher-order functions over embeddings: size, first element,
    * L2 norm via transform + aggregate (a sequential double fold — same
    * element order as the oracle's list_sum over DOUBLE[]).
    */
  def qScalarArray(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        (round(element_at(col("embedding"), 1).cast("double"), 6) + lit(0.0)).as("first_val"),
        (round(
          sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double")),
            lit(0.0), (acc, x) => acc + x * x)), 6) + lit(0.0)).as("l2_norm"))
      .orderBy(asc_nulls_first("vec_id"))
}
