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

  test("banded asof: equals tolerance-filtered plain asof on a long-history key") {
    import spark.implicits._
    // user 1 has 200 right rows over a long span — the unbounded-history
    // shape the banded variant exists for. Tolerance 300 = band width.
    val left = Seq(
      (1L, 1L, 9999L),  // nearest right (9950) inside tolerance
      (2L, 1L, 5000L),  // exact band-boundary neighborhood
      (3L, 1L, 99L),    // match in previous band
      (4L, 1L, 30000L), // nearest right (9950) OUTSIDE tolerance → no row
      (5L, 2L, 500L))   // no right rows for this key at all
      .toDF("event_id", "user_id", "t")
    val right = (0 until 200).map(i => (1L, i.toLong * 50, i.toLong))
      .toDF("o_user", "o_t", "o_id")
    val tol = 300L
    val banded = AsofJoin.asofBackwardBanded(left, right,
      "user_id", "o_user", "t", "o_t", "event_id", "o_id", tol)
      .select($"event_id", $"o_id")
    val plain = AsofJoin.asofBackward(left, right,
      "user_id", "o_user", "t", "o_t", "event_id", "o_id")
      .filter($"o_t" > $"t" - tol)
      .select($"event_id", $"o_id")
    assert(banded.exceptAll(plain).count() == 0 &&
      plain.exceptAll(banded).count() == 0)
    val got = banded.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 199L, 2L -> 100L, 3L -> 1L))
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
