package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over every oracle query: correctness
  * tests cannot see a plan that silently went quadratic (a dropped join
  * condition turns an equi-join into a cartesian and still returns the
  * right rows after the filter). Lock the plan class down instead.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  /** Queries allowed a pairwise nested-loop plan. EMPTY as of round 5:
    * q_sim_topk's probe broadcast was replaced by the blocked grid
    * equi-join (SimilarityQueries.blockedTopKFrom), the last BNLJ in
    * the inventory. Kept as a set so a future declared baseline states
    * its name here instead of weakening the assertion.
    */
  private val pairwiseBaselines = Set.empty[String]

  /** Queries whose BNLJ is a single-row broadcast cross join (a scalar
    * like corpus size N entering the plan) — constant work per row at
    * any scale, nothing pairwise about it.
    */
  private val scalarBroadcasts = Set("q_tfidf",
    // the unicode twin — same 1-row corpus-size broadcast as q_tfidf
    "q_tfidf_unicode",
    // corpus token total N entering the ≥1% threshold as a 1-row
    // broadcast — same shape as tfidf's N
    "q_heavy_hitters",
    // corpus stats row (N, Σdl, per-term df) re-entering the scoring
    // projection — 1 row at any scale
    "q_bm25",
    // corpus token total N entering the coverage division — 1 row,
    // joined against the post-limit 500-row vocab
    "q_vocab_coverage",
    // (total_tokens, weight_sum) scalar row entering the per-source
    // rate computation — 1 row against the |sources|-row summary
    "q_mix_budget",
    // global (Σbal, n) average row entering the above-average filter —
    // 1 row at any scale, Q22's scalar subquery
    "q_idle_rich",
    // (n_docs, n_clustered) 1-row aggregates differenced into the
    // singleton-cluster row of the size histogram
    "q_cluster_sizes",
    // corpus token total N entering the PMI of the post-limit 50
    // collocations — 1 row at any scale, q_tfidf's shape
    "q_collocations",
    // corpus max-day anchor entering the age computation — 1 row
    "q_decayed_sum",
    // distinct-order total N entering the lift denominator — 1 row at
    // any scale, q_tfidf's shape
    "q_assoc_rules",
    // (n_total, k_labels, max_n) 1-row aggregate entering the
    // per-label weight computation
    "q_class_balance",
    // (n_a, n_b) sample-size row entering the ECDF gap scaling — 1 row
    "q_ks_test",
    // customer-count row entering the decile-bucket ceil — 1 row
    "q_lorenz",
    // corpus-end anchor entering the censoring cutoff — 1 row
    "q_survival",
    // transition-stream total entering the entropy-rate weights — 1 row
    "q_entropy_rate",
    // 1-row sign-convention scalar flipping the final eigenvector
    "q_pca_power",
    // 1-row L1 normalizer of the final HITS round (earlier rounds sit
    // behind lazy checkpoints)
    "q_hits",
    // 1-row min-class-size bound entering the per-class rank filter
    "q_sample_balanced",
    // corpus token total N entering the keyness excess — 1 row at any
    // scale, q_tfidf's shape
    "q_keyness",
    // 1-row purchase-sample total entering the dominance products
    "q_cliff_delta",
    // 1-row edge-count m entering the modularity numerator/denominator
    "q_modularity",
    // 1-row (k+1)-th order statistic entering the log-ratio terms of
    // the post-TakeOrdered 500-row frame
    "q_hill_tail",
    // 1-row (N, tie-sum) aggregate entering the per-segment rank rows
    "q_kruskal_wallis",
    // 1-row (n_a, n_b) sample sizes entering the ECDF area terms
    "q_emd",
    // 1-row (tot_buyers, tot_users) base-rate scalar entering the
    // per-decile lift — 1 row against the 10-row decile grid
    "q_lift",
    // 1-row bigram-stream total entering the coverage division of the
    // post-limit 100-row frame — q_vocab_coverage's shape
    "q_bigram_coverage",
    // 1-row corpus-end anchor entering the staleness/last-day fold —
    // q_survival's shape
    "q_freshness",
    // 1-row (n_orders, full mean) scalar joined onto the 1-row CI fold
    "q_bootstrap_ci",
    // 1-row token/vocab totals joined onto the 1-row doc summary
    "q_corpus_summary")

  /** Queries whose BNLJ is a dimension-grid cross join (calendar days ×
    * event types in q_resample): both sides are tiny dimension products —
    * O(days × types) at any data scale — and the build side must be a
    * broadcast exchange, which `assertBroadcastBuild` verifies so the
    * allowance cannot mask an accidental fact×fact cross join.
    */
  private val dimensionGridBroadcasts = Set("q_resample",
    // probe×centroid cross join: the centroid table is nLists rows
    // (corpus-size-independent) — the probe side must stream
    "ann_ivf_topk",
    // event-type × event-type pair grid (|types|² rows, schema-bounded);
    // everything data-sized happened before, in the sketch build
    "q_overlap_kmv",
    // probe × class grid (the zero-score rows a one-vs-rest AUC must
    // keep); classes are a handful at any scale and must broadcast
    "q_auc",
    // customer × month spine for the carry-forward: months are a tiny
    // calendar dimension and must broadcast against the customer side
    "q_eop_balance",
    // vocab × other-sources grid for the pairwise KL sums: the source
    // list is |sources| rows at any scale and must broadcast
    "q_js_divergence",
    // test-doc × class grid (k classes at any scale) plus the 1-row
    // vocab-size and train-count scalars entering the class stats —
    // every build side must broadcast
    "q_naive_bayes",
    // day × day pair grid under d1 < d2 (q_mann_kendall's shape on a
    // days-bounded fold) — both sides tiny, build must broadcast
    "q_kendall_tau",
    // 3-row n-gram-length grid × 1-row denominator — both broadcast
    "q_decontaminate_ladder",
    // 19-row quantile grid joined on the rank-selection equation —
    // the grid is constant-size at any scale and must broadcast
    "q_qq_plot",
    // 5×5 priority pair grid under g1 < g2 plus the 1-row MSW scalar —
    // q_kendall_tau's shape on the group dimension
    "q_tukey",
    // 64×16 sign-matrix grid (two range relations crossed) — corpus-
    // independent, broadcast into the dim equi-join
    "q_jl_project")
    // NOTE: q_qq_plot joins the broadcast 19-row quantile grid on the
    // rank-selection equation — q_auc's dimension-grid shape — and is
    // declared below in dimensionGridBroadcasts.

  private def flatten(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case p => p +: p.children.flatMap(flatten)
  }

  /** Every BNLJ in the plan must build from a broadcast exchange (the
    * tiny dimension side), never stream×stream.
    */
  private def assertBroadcastBuild(name: String, nodes: Seq[SparkPlan]): Unit =
    nodes.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
      }
      assert(flatten(build).exists {
        case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => true
        case _: org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec => true
        case _ => false
      }, s"$name has a BroadcastNestedLoopJoin whose build side is not a broadcast exchange")
    }

  /** Queries allowed a window fed by an `Exchange SinglePartition`
    * because the frame entering the window is BOUNDED — by a value
    * domain, a calendar axis, or a schema-sized grid — not
    * corpus-proportional. Every entry names its bound. Structurally
    * provable bounded shapes (a below-exchange limit, a global 1-row
    * fold, or partitionedRank's `__pr_pid` per-shuffle-partition
    * stats frame) are recognized without being listed.
    */
  private val boundedGlobalWindows: Map[String, String] = Map(
    // fixed replica/grid axes — schema- or constant-sized at any scale
    "q_bootstrap_ci" -> "40 bootstrap replica cells (constant)",
    "q_contingency" -> "segment × priority grid (5×5)",
    "q_cramers_v" -> "segment × priority grid (5×5)",
    "q_mutual_info" -> "event-type × hour grid",
    "q_cond_entropy" -> "event-type × category grid",
    "q_weekly_rhythm" -> "7-day × 24-hour grid (168 rows)",
    "q_cosine_hist" -> "fixed cosine bins",
    "q_hist2d" -> "fixed 2-D value bins",
    "q_token_len_dist" -> "token-length domain",
    "q_user_activity_hist" -> "fixed activity buckets",
    "q_lines_per_order" -> "lines-per-order domain (≤ max order size)",
    "q_sample_temperature" -> "|sources| rows",
    // calendar axes — days/weeks in the observed span, not corpus rows
    "q_churn" -> "|weeks| rows",
    "q_cum_distinct" -> "|days| rows",
    "q_pct_change" -> "|days| rows",
    "q_rolling_corr" -> "|days| rows",
    "q_survival" -> "distinct lifetime days (≤ span)",
    "q_power_users" -> "days-active histogram (≤ span days)")

  private def isWindow(p: SparkPlan): Boolean =
    p.getClass.getSimpleName.startsWith("Window")

  /** The first shuffle exchange strictly below `p` along single-child
    * descent (the exchange that feeds this operator's distribution).
    */
  @annotation.tailrec
  private def feedingExchange(p: SparkPlan): Option[ShuffleExchangeExec] =
    p.children match {
      case Seq(e: ShuffleExchangeExec) => Some(e)
      case Seq(child) => feedingExchange(child)
      case _ => None
    }

  /** Nodes below `p` down to (and excluding) the next shuffle
    * exchange — the producing stage of `p`'s input.
    */
  private def stageBelow(p: SparkPlan): Seq[SparkPlan] = p match {
    case _: ShuffleExchangeExec => Seq.empty
    case _ => p +: p.children.flatMap(stageBelow)
  }

  /** Structural evidence the exchange's input is bounded regardless of
    * corpus size: a limit upstream in the same stage, an ungrouped
    * (1-row) aggregate, or ScaleOps.partitionedRank's per-partition
    * stats aggregate (grouped by `__pr_pid` — ≤ shuffle-partition
    * CONFIG rows by construction).
    */
  private def boundedByConstruction(below: Seq[SparkPlan]): Boolean =
    below.exists {
      case _: GlobalLimitExec | _: LocalLimitExec |
           _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case a: BaseAggregateExec =>
        a.groupingExpressions.isEmpty ||
          a.groupingExpressions.exists(_.references.exists(
            _.name == "__pr_pid"))
      case _ => false
    }

  test("no corpus-scaled single-partition window (global-order rank/cumsum)") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val nodes = flatten(fn(spark, sfDir).queryExecution.executedPlan)
        nodes.filter(isWindow).flatMap { w =>
          feedingExchange(w) match {
            case Some(e) if e.outputPartitioning == SinglePartition &&
                !boundedByConstruction(e.children.flatMap(stageBelow)) &&
                !boundedGlobalWindows.contains(name) =>
              Some(s"$name: ${w.nodeName} fed by Exchange SinglePartition over " +
                e.child.nodeName)
            case _ => None
          }
        }.headOption
    }
    assert(violations.isEmpty,
      "single-partition windows over unproven axes (declare in " +
        "boundedGlobalWindows with the bound, or rewrite via " +
        "ScaleOps.partitionedRank):\n" + violations.mkString("\n"))
  }

  test("no cartesian products; nested-loop joins only in declared pairwise baselines") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val nodes = flatten(fn(spark, sfDir).queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        s"$name plans a CartesianProduct")
      if (dimensionGridBroadcasts(name))
        assertBroadcastBuild(name, nodes)
      else if (!pairwiseBaselines(name) && !scalarBroadcasts(name))
        assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
          s"$name plans a BroadcastNestedLoopJoin")
    }
  }
}
