package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistical operator invariants. */
class StatsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("median lies within each segment's min/max; counts match") {
    import spark.implicits._
    val bounds = Tables.customer(spark, sfDir).groupBy("c_mktsegment")
      .agg(min($"c_acctbal").as("lo"), max($"c_acctbal").as("hi"),
        count(lit(1)).as("n"))
    val bad = q("q_median").join(bounds, "c_mktsegment")
      .filter($"median_acctbal" < $"lo" || $"median_acctbal" > $"hi" ||
        $"n_customers" =!= $"n")
      .count()
    assert(bad == 0)
  }

  test("correlation in [-1,1] and matches Spark's built-in corr to 1e-4") {
    import spark.implicits._
    val builtin = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("ref"))
    val bad = q("q_corr").join(builtin, "l_returnflag")
      .filter($"corr_qty_price" < -1 || $"corr_qty_price" > 1 ||
        abs($"corr_qty_price" - $"ref") > 1e-4)
      .count()
    assert(bad == 0)
  }

  test("histogram buckets partition all orders with consistent bounds") {
    import spark.implicits._
    val out = q("q_histogram")
    assert(out.agg(sum($"n_orders")).as[Long].head() ==
      Tables.orders(spark, sfDir).count())
    assert(out.filter($"hi" =!= $"lo" + 50000L || $"n_orders" <= 0).count() == 0)
  }
}
