package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps

/** Co-located joins via bucketed tables: the shuffle is paid once at
  * write time (the reference's nReduce hash sharding is the same
  * layout, never exploited on read), after which equi-joins on the
  * bucket key plan with NO exchange on either side.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def exchanges(plan: SparkPlan): Seq[Exchange] = plan match {
    case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
    case e: Exchange => e +: e.children.flatMap(exchanges)
    case other => other.children.flatMap(exchanges)
  }

  test("same-bucketed tables join with no exchange, same result as plain join") {
    ScaleOps.writeBucketed(Tables.orders(spark, sfDir), "orders_b", "o_custkey", 8)
    ScaleOps.writeBucketed(Tables.customer(spark, sfDir), "customer_b", "c_custkey", 8)
    // force a real sort-merge join: broadcast would also be
    // exchange-free at this SF but would prove nothing about bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleOps.bucketedJoin(spark,
        "orders_b", "customer_b", "o_custkey", "c_custkey")
      assert(exchanges(joined.queryExecution.executedPlan).isEmpty,
        "bucketed join should not shuffle:\n" +
          joined.queryExecution.executedPlan.toString)
      val plain = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey"))
      assert(joined.count() == plain.count())
      // and a groupBy on the bucket key also avoids the exchange
      val agg = spark.table("orders_b").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      assert(exchanges(agg.queryExecution.executedPlan).isEmpty,
        "aggregation on the bucket key should not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
