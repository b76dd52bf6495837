package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** The generic as-of operator and the end-to-end pipeline query. */
class AsofPipelineSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("generic asofBackward reproduces q_join_asof") {
    val viaOp = AsofJoin.asofBackward(
      Tables.events(spark, sfDir), Tables.orders(spark, sfDir),
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      leftId = "event_id", rightTieBreak = "o_orderkey")
      .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
    val viaQuery = SparkEntry.queries("q_join_asof")(spark, sfDir)
    assert(viaOp.exceptAll(viaQuery).count() == 0 &&
      viaQuery.exceptAll(viaOp).count() == 0)
  }

  test("asofForward picks the earliest following row") {
    import spark.implicits._
    val out = AsofJoin.asofForward(
      Tables.events(spark, sfDir), Tables.orders(spark, sfDir),
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      leftId = "event_id", rightTieBreak = "o_orderkey")
    assert(out.filter($"o_orderdate" < $"ts").count() == 0)
    assert(out.groupBy("event_id").count().filter($"count" > 1).count() == 0)
  }

  test("pipeline: kept docs never exceed canonical count, stats sane") {
    import spark.implicits._
    val out = SparkEntry.queries("q_pipeline")(spark, sfDir)
    val kept = out.agg(sum($"n_docs")).as[Long].head()
    val canonical = Tables.documents(spark, sfDir).select("text").distinct().count()
    assert(kept <= canonical && kept > 0)
    assert(out.filter($"avg_stop_ratio" < 0 || $"avg_stop_ratio" > 0.5).count() == 0)
  }
}
