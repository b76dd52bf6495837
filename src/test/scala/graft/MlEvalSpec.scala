package graft

import graft.operators.{AnalyticsQueries, BehaviorQueries, MlEvalQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the model-eval / curation operators — each
  * test asserts a conservation law the operator must satisfy on ANY
  * input (fractions sum to 1, splits partition, degrees sum to 2m),
  * not a golden value of this fixture.
  */
class MlEvalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q_class_balance: fractions sum to 1, weights invert frequency, majority is max") {
    val out = MlEvalQueries.qClassBalance(spark, sfDir).collect()
    val nTotal = Tables.embeddings(spark, sfDir).count()
    val k = out.length
    assert(out.map(_.getAs[Long]("n_vecs")).sum == nTotal)
    val fracSum = out.map(_.getAs[Double]("frac")).sum
    assert(math.abs(fracSum - 1.0) < 1e-4, s"fractions sum to $fracSum")
    // class_weight = n_total / (k * n): reconstruct and compare at 6 dp
    out.foreach { r =>
      val expected = nTotal.toDouble / (k * r.getAs[Long]("n_vecs"))
      assert(math.abs(r.getAs[Double]("class_weight") - expected) < 1e-5)
    }
    val maxN = out.map(_.getAs[Long]("n_vecs")).max
    assert(out.filter(_.getAs[Boolean]("is_majority"))
      .forall(_.getAs[Long]("n_vecs") == maxN))
    assert(out.exists(_.getAs[Boolean]("is_majority")))
  }

  test("q_embed_var: 64 dims, nonnegative variance, full row coverage") {
    val out = MlEvalQueries.qEmbedVar(spark, sfDir).collect()
    assert(out.length == 64)
    val nTotal = Tables.embeddings(spark, sfDir).count()
    assert(out.forall(_.getAs[Long]("n_vecs") == nTotal))
    assert(out.forall(_.getAs[Double]("variance") >= 0.0))
  }

  test("q_split_group: every source lands in exactly one split; docs conserved") {
    val out = MlEvalQueries.qSplitGroup(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // a grouped split is leakage-safe iff per-split distinct sources
    // sum to the corpus' distinct sources (no source straddles)
    assert(out.map(_.getAs[Long]("n_sources")).sum ==
      docs.select("source").distinct().count())
    assert(out.map(_.getAs[Long]("n_chars")).sum ==
      docs.agg(sum("n_chars")).head().getLong(0))
  }

  test("q_knn_confusion: probes conserved, rates row-normalize to 1") {
    val out = MlEvalQueries.qKnnConfusion(spark, sfDir).collect()
    val nProbes = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 100 === 0).count()
    assert(out.map(_.getAs[Long]("n_probes")).sum == nProbes)
    out.groupBy(_.getAs[Int]("true_label")).foreach { case (_, rows) =>
      val s = rows.map(_.getAs[Double]("rate")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"row rates sum to $s")
    }
  }

  test("q_cum_distinct: monotone running sum reaching the exact distinct-user count") {
    val out = MlEvalQueries.qCumDistinct(spark, sfDir).collect()
    val distinctUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_new_users")).sum == distinctUsers)
    assert(out.last.getAs[Long]("cum_users") == distinctUsers)
    val cums = out.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
  }

  test("q_outlier_iqr: fences bracket the quartiles and outliers are a strict minority") {
    val out = MlEvalQueries.qOutlierIqr(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q1, q3) = (r.getAs[Double]("q1"), r.getAs[Double]("q3"))
      assert(r.getAs[Double]("lo_fence") <= q1 && q1 <= q3 &&
        q3 <= r.getAs[Double]("hi_fence"))
      // by construction ≥ 50% of values lie inside [q1, q3] ⊂ fences
      assert(r.getAs[Long]("n_outliers") * 2 < r.getAs[Long]("n_events"))
    }
  }

  test("q_prf: probe conservation and agreement with the confusion diagonal") {
    val prf = MlEvalQueries.qPrf(spark, sfDir).collect()
    val conf = MlEvalQueries.qKnnConfusion(spark, sfDir).collect()
    val nProbes = conf.map(_.getAs[Long]("n_probes")).sum
    assert(prf.map(_.getAs[Long]("n_true")).sum == nProbes)
    assert(prf.map(_.getAs[Long]("n_pred")).sum == nProbes)
    // tp per label is exactly the confusion-matrix diagonal
    val diag = conf.filter(r => r.getAs[Int]("true_label") == r.getAs[Int]("pred_label"))
      .map(r => r.getAs[Int]("true_label") -> r.getAs[Long]("n_probes")).toMap
    prf.foreach { r =>
      assert(r.getAs[Long]("tp") == diag.getOrElse(r.getAs[Int]("label"), 0L))
      assert(r.getAs[Double]("f1") >= 0.0 && r.getAs[Double]("f1") <= 1.0)
    }
  }

  test("q_assoc_rules: lift is symmetric, confidence bounded, identity conf/baseline") {
    val rules = operators.BehaviorQueries.qAssocRules(spark, sfDir).collect()
    assert(rules.nonEmpty)
    val byPair = rules.map(r => (r.getAs[Long]("antecedent"),
      r.getAs[Long]("consequent")) -> r).toMap
    rules.foreach { r =>
      assert(r.getAs[Double]("confidence") > 0.0 &&
        r.getAs[Double]("confidence") <= 1.0)
      // reversed rule exists with identical joint count and lift
      val rev = byPair((r.getAs[Long]("consequent"), r.getAs[Long]("antecedent")))
      assert(rev.getAs[Long]("n_both") == r.getAs[Long]("n_both"))
      assert(math.abs(rev.getAs[Double]("lift") - r.getAs[Double]("lift")) < 2e-6)
    }
  }

  test("q_weighted_median: half the units lie on each side of the reported price") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val wm = operators.StatsQueries.qWeightedMedian(spark, sfDir).collect()
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("wt"))
    wm.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val m = r.getAs[Double]("weighted_median_price")
      val total = r.getAs[Long]("total_units")
      val below = li.filter(col("l_returnflag") === flag &&
        col("l_extendedprice") <= m).agg(fsum("wt")).head().getLong(0)
      val above = li.filter(col("l_returnflag") === flag &&
        col("l_extendedprice") >= m).agg(fsum("wt")).head().getLong(0)
      assert(below * 2 >= total, s"$flag: units at or below $m under half")
      assert(above * 2 >= total, s"$flag: units at or above $m under half")
    }
  }

  test("q_calibration: buckets cover every probe; correct total matches the confusion diagonal") {
    val cal = MlEvalQueries.qCalibration(spark, sfDir).collect()
    val conf = MlEvalQueries.qKnnConfusion(spark, sfDir).collect()
    assert(cal.map(_.getAs[Long]("n_probes")).sum ==
      conf.map(_.getAs[Long]("n_probes")).sum)
    val diagTotal = conf
      .filter(r => r.getAs[Int]("true_label") == r.getAs[Int]("pred_label"))
      .map(_.getAs[Long]("n_probes")).sum
    assert(cal.map(_.getAs[Long]("n_correct")).sum == diagTotal)
    cal.foreach { r =>
      assert(r.getAs[Long]("votes") >= 1 && r.getAs[Long]("votes") <= 5)
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  test("q_embed_quantiles: ordered bounds on all 64 dims") {
    val out = MlEvalQueries.qEmbedQuantiles(spark, sfDir).collect()
    assert(out.length == 64)
    out.foreach { r =>
      assert(r.getAs[Double]("p05") <= r.getAs[Double]("p95"))
      assert(r.getAs[Double]("clip_range") >= 0.0)
    }
  }

  test("q_zipf_slope: non-positive slope with sane fit stats") {
    val r = operators.AdvancedTextQueries.qZipfSlope(spark, sfDir).head()
    assert(r.getAs[Long]("n_tokens") > 0)
    // counts are non-increasing in rank, so the OLS slope cannot be positive
    assert(r.getAs[Double]("zipf_slope") <= 0.0)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
  }

  test("q_degree_dist: handshake lemma — degrees sum to twice the edge count") {
    val out = MlEvalQueries.qDegreeDist(spark, sfDir).collect()
    val m = BehaviorQueries.cooccurPairCounts(Tables.lineitem(spark, sfDir))
      .filter(col("n_orders") >= AnalyticsQueries.PagerankMinCooccur)
      .count()
    val degSum = out.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum
    assert(degSum == 2 * m, s"degree sum $degSum != 2m = ${2 * m}")
  }

  test("q_pca_power: L-inf normalized, sign-fixed, aligned with a local eigensolve") {
    val out = MlEvalQueries.qPcaPower(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("dim"))
    assert(out.length == 64)
    val v = out.map(_.getAs[Long]("loading_fp").toDouble / 1e6)
    assert(v.forall(x => x >= -1.0 - 1e-9 && x <= 1.0 + 1e-9))
    // L-inf normalization + sign fix: the largest |loading| is exactly +1
    assert(math.abs(v.map(math.abs).max - 1.0) < 1e-9)
    assert(v(v.map(math.abs).zipWithIndex.maxBy(t => (t._1, -t._2))._2) > 0)
    // local reference: double-precision power iteration on the exact
    // covariance must align (up to sign) with the integer fixed point
    val rows = Tables.embeddings(spark, sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val mean = Array.tabulate(64)(d => rows.map(_(d)).sum / n)
    val cov = Array.tabulate(64, 64) { (a, b) =>
      rows.map(r => (r(a) - mean(a)) * (r(b) - mean(b))).sum / n
    }
    // same depth as the query: the comparison validates the integer
    // covariance + iteration against a double-precision reference, not
    // asymptotic convergence (this fixture's spectrum is nearly
    // degenerate — λ1/λ2 ≈ 1.01 — so any FIXED depth is "the k-round
    // power iterate", which is exactly what the query contracts)
    var x = Array.fill(64)(1.0)
    (1 to MlEvalQueries.PcaPowerIters).foreach { _ =>
      val w = Array.tabulate(64)(a =>
        (0 until 64).map(b => cov(a)(b) * x(b)).sum)
      val m = w.map(math.abs).max
      x = w.map(_ / m)
    }
    val dot = v.zip(x).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(v.map(y => y * y).sum) * math.sqrt(x.map(y => y * y).sum))
    assert(cos > 0.999, s"integer PCA misaligned with double reference: cos=$cos")
  }

  test("q_auc: one row per class, pos/neg partition the probe set, AUC in [0,1]") {
    val out = MlEvalQueries.qAuc(spark, sfDir).collect()
    val emb = Tables.embeddings(spark, sfDir)
    assert(out.length == emb.select("label").distinct().count())
    val nProbes = emb
      .filter(col("vec_id") % MlEvalQueries.RankProbeModulus === 0).count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == nProbes)
      val auc = r.getAs[Double]("auc")
      assert(auc >= 0.0 && auc <= 1.0, s"auc $auc out of range")
    }
    // every probe is positive for exactly one class
    assert(out.map(_.getAs[Long]("n_pos")).sum == nProbes)
  }

  test("q_ndcg: probes conserved across classes, mean NDCG in [0,1]") {
    val out = MlEvalQueries.qNdcg(spark, sfDir).collect()
    val nProbes = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % MlEvalQueries.RankProbeModulus === 0).count()
    assert(out.map(_.getAs[Long]("n_probes")).sum == nProbes)
    out.foreach { r =>
      val v = r.getAs[Double]("mean_ndcg")
      assert(v >= 0.0 && v <= 1.0 + 1e-9, s"ndcg $v out of range")
    }
  }

  test("q_naive_bayes: test docs conserved; the generative model beats chance") {
    val out = SparkEntry.queries("q_naive_bayes")(spark, sfDir).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    // confusion cells partition exactly the md5 test bucket (b >= 90)
    val nTest = Tables.documents(spark, sfDir)
      .filter(conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long") % 100 >= 90)
      .count()
    assert(total == nTest, s"confusion covers $total of $nTest test docs")
    val correct = out.filter(r =>
      r.getAs[String]("true_lang") == r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n_docs")).sum
    // 5 balanced classes: chance is ~0.2. The sf0.001 fixture trains
    // on ~400 heavily-overlapping synthetic docs and scores ~0.48 —
    // 2.4× chance; assert a wide margin over chance, not fixture-tuned
    // accuracy (a broken model join or dropped prior lands at ≤0.25)
    assert(correct.toDouble / total > 0.35,
      s"NB accuracy ${correct.toDouble / total} barely beats chance")
  }

  test("q_cohen_kappa: cells partition the corpus; kappa re-derives and is bounded") {
    val r = SparkEntry.queries("q_cohen_kappa")(spark, sfDir).collect().head
    val (a, b, c, d) = (r.getAs[Long]("keep_keep"), r.getAs[Long]("keep_drop"),
      r.getAs[Long]("drop_keep"), r.getAs[Long]("drop_drop"))
    assert(a + b + c + d == r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("n_docs") ==
      Tables.documents(spark, sfDir).count())
    val kappa = r.getAs[Double]("kappa")
    assert(kappa >= -1.0 - 1e-9 && kappa <= 1.0 + 1e-9, s"kappa $kappa")
    val expect = 2.0 * (a * d - b * c) /
      ((a + b).toDouble * (b + d) + (a + c).toDouble * (c + d))
    assert(math.abs(kappa - expect) < 1e-6)
  }

  test("q_brier: bounded proper scores, consistent with q_calibration") {
    val r = SparkEntry.queries("q_brier")(spark, sfDir).collect().head
    val brier = r.getAs[Double]("brier")
    val ll = r.getAs[Double]("log_loss")
    assert(brier >= 0 && brier <= 1.0 + 1e-9, s"brier $brier")
    // smoothed q in [2/7, 6/7] bounds each term by -ln(1/7)
    assert(ll >= 0 && ll <= math.log(7.0) + 1e-9, s"log_loss $ll")
    // same probe population and accuracy as the calibration curve
    val cal = SparkEntry.queries("q_calibration")(spark, sfDir).collect()
    assert(cal.map(_.getAs[Long]("n_probes")).sum == r.getAs[Long]("n_probes"))
    assert(cal.map(_.getAs[Long]("n_correct")).sum == r.getAs[Long]("n_correct"))
    // Brier is minimized at perfect calibration: sanity re-derive from
    // the calibration buckets (same cells, same per-cell terms)
    val rederived = cal.map { c =>
      val p = c.getAs[Long]("votes").toDouble / 5
      val nc = c.getAs[Long]("n_correct")
      val nw = c.getAs[Long]("n_probes") - nc
      nc * math.pow(p - 1, 2) + nw * math.pow(p, 2)
    }.sum / cal.map(_.getAs[Long]("n_probes")).sum
    assert(math.abs(brier - rederived) < 1e-4, s"brier $brier vs $rederived")
  }

  test("q_jl_project: norm-preservation ratios near 1, full label coverage") {
    val rows = SparkEntry.queries("q_jl_project")(spark, sfDir).collect()
    val labels = Tables.embeddings(spark, sfDir)
      .select("label").distinct().count()
    assert(rows.length == labels)
    val nVecs = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(nVecs == Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      val (mn, mean, mx) = (r.getAs[Double]("min_ratio"),
        r.getAs[Double]("mean_ratio"), r.getAs[Double]("max_ratio"))
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9)
      assert(mn > 0, s"min ratio $mn not positive")
      // E[ratio] = 1 with sd ~ sqrt(2/k) ≈ 0.35 per vector; the
      // per-label MEAN over hundreds of vectors concentrates hard —
      // a sign-matrix bug (all +1) would inflate it by ~√64
      assert(mean > 0.5 && mean < 1.5, s"mean ratio $mean far from 1")
    }
  }

  test("q_cosine_hist: shares sum to 1 over the exact sample pair count") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_cosine_hist")(spark, sfDir).collect()
    val s = Tables.embeddings(spark, sfDir)
      .filter(conv(substring(md5(col("vec_id").cast("string")), 1, 4),
        16, 10).cast("long") % 100 < 10).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == s * (s - 1) / 2,
      "histogram does not cover every sample pair")
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= -20 && b <= 20, s"bucket $b out of cosine range")
      assert(math.abs(r.getAs[Double]("cos_lo") - b / 20.0) < 1e-9)
    }
  }

  test("q_embed_dedup_sweep: monotone and reconciles with the cosine histogram") {
    val rows = SparkEntry.queries("q_embed_dedup_sweep")(spark, sfDir)
      .collect().sortBy(_.getAs[Double]("threshold"))
    assert(rows.map(_.getAs[Double]("threshold")).toSeq == Seq(0.8, 0.9, 0.95))
    val ps = rows.map(_.getAs[Long]("n_pairs"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
    val ds = rows.map(_.getAs[Long]("n_vecs_flagged"))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    // the 0.8 pair count equals the histogram mass in buckets >= 16
    // (cosine >= 0.8 ⟺ floor(20·cosine) >= 16 — same rounded cosine)
    val hist = SparkEntry.queries("q_cosine_hist")(spark, sfDir).collect()
    val histHigh = hist.filter(_.getAs[Int]("bucket") >= 16)
      .map(_.getAs[Long]("n_pairs")).sum
    assert(ps.head == histHigh,
      s"sweep 0.8 (${ps.head}) != hist mass >= 0.8 ($histHigh)")
  }

  test("q_embed_outliers: 5 per label, ordered ranks, above-mean distances") {
    val rows = SparkEntry.queries("q_embed_outliers")(spark, sfDir).collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    byLabel.values.foreach { g =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
      // ratios decrease with rank (ties broken by vec_id keep order weak)
      val rs = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("ratio_to_mean"))
      assert(rs.zip(rs.tail).forall { case (a, b) => a >= b - 1e-9 })
      // the top outlier sits above the label mean squared distance
      assert(rs.head >= 1.0 - 1e-6, s"top outlier ratio ${rs.head} below mean")
      g.foreach(r => assert(r.getAs[Double]("dist") >= 0))
    }
  }
}
