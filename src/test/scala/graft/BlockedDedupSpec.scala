package graft

import graft.operators.SimilarityQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The blocked triangular self-join behind q_dedup_embed must produce
  * the EXACT pair set of the brute-force nested loop it replaced — same
  * ids, same 6-dp cosines — and must plan as an equi-join (no
  * BroadcastNestedLoopJoin), or the scale story is fiction.
  */
class BlockedDedupSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def emb(dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), SimilarityQueries.asDoubles(col("embedding")).as("vec"))

  private def flatten(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case p => p +: p.children.flatMap(flatten)
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("blocked pair join is bit-identical to brute force at sf0.001 and sf0.01") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val e = emb(dir)
      val blocked = pairSet(SimilarityQueries.blockedDedupPairsFrom(e, 0.4))
      val brute = pairSet(SimilarityQueries.bruteDedupPairsFrom(e, 0.4))
      assert(blocked == brute, s"pair sets differ at $dir")
      assert(blocked.nonEmpty, s"degenerate test: no qualifying pairs at $dir")
    }
  }

  test("blocked pair join never survives a block-count change (partition-invariance)") {
    val e = emb(sfDir)
    val b12 = pairSet(SimilarityQueries.blockedDedupPairsFrom(e, 0.4, nBlocks = 12))
    val b5 = pairSet(SimilarityQueries.blockedDedupPairsFrom(e, 0.4, nBlocks = 5))
    val b1 = pairSet(SimilarityQueries.blockedDedupPairsFrom(e, 0.4, nBlocks = 1))
    assert(b12 == b5 && b5 == b1)
  }

  test("blocked plan contains no BroadcastNestedLoopJoin") {
    val df = SimilarityQueries.blockedDedupPairsFrom(emb(sfDir), 0.4)
    df.collect() // let AQE finalize the adapted plan
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }
}
