package graft

import graft.operators.SimilarityQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The blocked grid join behind q_sim_topk must produce the EXACT rows
  * of the brute-force probe-broadcast plan it replaced — same probes,
  * same neighbors, same 6-dp cosines, same ranks — and must plan as an
  * equi-join (no BroadcastNestedLoopJoin), or the scale story is
  * fiction. Mirrors BlockedDedupSpec for the dedup twin.
  */
class BlockedTopKSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def emb(dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), SimilarityQueries.asDoubles(col("embedding")).as("vec"))

  private def flatten(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case p => p +: p.children.flatMap(flatten)
  }

  private def rowSet(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("blocked top-k is row-identical to brute force at sf0.001 and sf0.01") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val e = emb(dir)
      val blocked = rowSet(SimilarityQueries.blockedTopKFrom(e, k = 5))
      val brute = rowSet(SimilarityQueries.bruteTopKFrom(e, k = 5))
      assert(blocked == brute, s"top-k rows differ at $dir")
      assert(blocked.nonEmpty, s"degenerate test: no probe rows at $dir")
    }
  }

  test("blocked top-k never survives a block-count change (partition-invariance)") {
    val e = emb(sfDir)
    val b12x4 = rowSet(SimilarityQueries.blockedTopKFrom(e, 5, 100, nBlocks = 12, probeBlocks = 4))
    val b5x2 = rowSet(SimilarityQueries.blockedTopKFrom(e, 5, 100, nBlocks = 5, probeBlocks = 2))
    val b1x1 = rowSet(SimilarityQueries.blockedTopKFrom(e, 5, 100, nBlocks = 1, probeBlocks = 1))
    assert(b12x4 == b5x2 && b5x2 == b1x1)
  }

  test("blocked top-k plan contains no BroadcastNestedLoopJoin") {
    val df = SimilarityQueries.blockedTopKFrom(emb(sfDir), k = 5)
    df.collect() // let AQE finalize the adapted plan
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }
}
