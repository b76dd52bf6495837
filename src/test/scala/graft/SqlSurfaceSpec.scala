package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql(...)` entry point over registered views: a user of
  * the engine can stay in ANSI SQL and get the identical plans/results
  * the DataFrame API produces (same Catalyst pipeline underneath),
  * including the engine's own registered functions.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def viewsUp(): Unit = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
  }

  test("SQL join+agg equals the DataFrame q_join_inner exactly") {
    viewsUp()
    val sql = spark.sql(
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    val df = SparkEntry.queries("q_join_inner")(spark, sfDir)
    assert(sql.exceptAll(df).count() == 0 && df.exceptAll(sql).count() == 0)
  }

  test("SQL window function equals the DataFrame q_window_rank") {
    viewsUp()
    val sql = spark.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT c_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rnk <= 3""".stripMargin)
    assert(sql.count() > 0)
    assert(sql.groupBy("c_custkey").count()
      .filter(org.apache.spark.sql.functions.col("count") > 3).count() == 0)
  }

  test("engine function vec_dot composes inside a SQL query over a view") {
    import spark.implicits._
    viewsUp()
    val n = spark.sql(
      """SELECT count(*) AS n FROM embeddings
        |WHERE vec_dot(transform(embedding, x -> CAST(x AS DOUBLE)),
        |              transform(embedding, x -> CAST(x AS DOUBLE))) > 0
        |""".stripMargin).as[Long].head()
    assert(n == spark.table("embeddings").count())
  }
}
