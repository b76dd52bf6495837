package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over every oracle query: correctness
  * tests cannot see a plan that silently went quadratic (a dropped join
  * condition turns an equi-join into a cartesian and still returns the
  * right rows after the filter). Lock the plan class down instead.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  /** The declared quadratic-by-design oracle baselines for the LSH/IVF
    * scale paths: their pairwise broadcast loop is the point (exact
    * answers to property-test recall against), so BNLJ is expected.
    */
  private val pairwiseBaselines = Set("q_sim_topk", "q_dedup_embed")

  /** Queries whose BNLJ is a single-row broadcast cross join (a scalar
    * like corpus size N entering the plan) — constant work per row at
    * any scale, nothing pairwise about it.
    */
  private val scalarBroadcasts = Set("q_tfidf")

  private def flatten(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case p => p +: p.children.flatMap(flatten)
  }

  test("no cartesian products; nested-loop joins only in declared pairwise baselines") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val nodes = flatten(fn(spark, sfDir).queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        s"$name plans a CartesianProduct")
      if (!pairwiseBaselines(name) && !scalarBroadcasts(name))
        assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
          s"$name plans a BroadcastNestedLoopJoin")
    }
  }
}
