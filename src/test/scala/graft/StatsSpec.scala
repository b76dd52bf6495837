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

  test("spearman in [-1,1] and matches built-in corr over the same doubled ranks") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def r2(c: String) = {
      val w = Window.partitionBy("l_returnflag").orderBy(col(c).asc)
      rank().over(w) + count(lit(1)).over(w)
    }
    val ref = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", r2("l_quantity").as("rx"),
        r2("l_extendedprice").as("ry"))
      .groupBy("l_returnflag").agg(corr($"rx", $"ry").as("ref"))
    val bad = q("q_corr_spearman").join(ref, "l_returnflag")
      .filter($"spearman_qty_price" < -1 || $"spearman_qty_price" > 1 ||
        abs($"spearman_qty_price" - $"ref") > 1e-4)
      .count()
    assert(bad == 0)
  }

  test("regression matches built-in regr_slope/intercept/r2 to 1e-4; r2 in [0,1]") {
    import spark.implicits._
    val ref = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        $"o_custkey" === $"c_custkey")
      .groupBy("c_mktsegment")
      .agg(
        expr("regr_slope(o_totalprice, c_acctbal)").as("ref_slope"),
        expr("regr_intercept(o_totalprice, c_acctbal)").as("ref_icept"),
        expr("regr_r2(o_totalprice, c_acctbal)").as("ref_r2"))
    val bad = q("q_regression").join(ref, "c_mktsegment")
      .filter($"r2" < 0 || $"r2" > 1 ||
        abs($"slope" - $"ref_slope") > 1e-4 ||
        abs($"intercept" - $"ref_icept") > 1e-4 ||
        abs($"r2" - $"ref_r2") > 1e-4)
      .count()
    assert(bad == 0)
  }

  test("benford: digits 1-9, per-priority freqs sum to 1, counts cover all orders") {
    import spark.implicits._
    val out = q("q_benford")
    assert(out.filter($"digit" < 1 || $"digit" > 9).count() == 0)
    assert(out.agg(sum($"n_orders")).as[Long].head() ==
      Tables.orders(spark, sfDir).count())
    val bad = out.groupBy("o_orderpriority")
      .agg(sum($"obs_freq").as("so"), sum($"exp_freq").as("se"))
      // obs rounds to 6 dp per digit: 9 digits bound the drift at 9e-6
      .filter(abs($"so" - 1.0) > 1e-5 || abs($"se" - 1.0) > 1e-5)
      .count()
    assert(bad == 0)
  }

  test("mutual info: cells conserve N, marginals consistent, MI non-negative") {
    import spark.implicits._
    val out = q("q_mutual_info").cache()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(out.agg(sum($"n")).as[Long].head() == nEvents)
    // each type's cells sum to its marginal
    val bad = out.groupBy("event_type", "n_type")
      .agg(sum($"n").as("s")).filter($"s" =!= $"n_type").count()
    assert(bad == 0)
    // MI >= 0 up to the per-cell half-micro-nat rounding slack
    val cells = out.count()
    val miMicro = out.agg(sum($"mi_term_micro")).as[Long].head()
    assert(miMicro >= -cells, s"MI $miMicro micro-nats below rounding slack")
    out.unpersist()
  }

  test("qCorr digit-group split is row-identical to the DECIMAL(38,0) comparator") {
    // the docstring's claimed equivalence proof: same rows, same doubles,
    // bit for bit — both forms assemble the identical exact integer sums
    val fast = q("q_corr")
    val decimal = operators.StatsQueries.qCorrDecimal(spark, sfDir)
    assert(fast.schema == decimal.schema)
    assert(fast.exceptAll(decimal).count() == 0 &&
      decimal.exceptAll(fast).count() == 0,
      "digit-group qCorr diverged from the decimal exact-sum form")
  }

  test("sketch_distinct query: HLL approx within 5% of the exact per-group count") {
    val rows = q("sketch_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("sketch_percentiles: every reported value is an order statistic within rank error n/accuracy") {
    import spark.implicits._
    val vals = Tables.customer(spark, sfDir)
      .select($"c_mktsegment", $"c_acctbal").as[(String, Double)]
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val rows = q("sketch_percentiles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getString(0)
      val n = r.getLong(1).toInt
      val sorted = vals(seg)
      assert(sorted.length == n)
      Seq(25, 50, 75, 90).zipWithIndex.foreach { case (p, i) =>
        val v = r.getDouble(2 + i)
        // GK guarantee: reported value's rank within n·(1/accuracy) of
        // the target rank; allow one extra row for boundary convention.
        // Ties: the value occupies a rank RANGE [first, last occurrence]
        // and the sketch may sit anywhere in it — pass if any tied rank
        // is within slack.
        val lo = sorted.indexOf(v)
        val hi = sorted.lastIndexOf(v)
        assert(lo >= 0, s"$seg p$p=$v is not a member of the column")
        val target = math.ceil(n * p / 100.0)
        val slack = n / 10000.0 + 1
        val dist = if (target < lo + 1) (lo + 1) - target
                   else if (target > hi + 1) target - (hi + 1)
                   else 0.0
        assert(dist <= slack,
          s"$seg p$p=$v at ranks ${lo + 1}..${hi + 1}, target $target, slack $slack")
      }
    }
  }

  test("approx_count_distinct (HLL) tracks the exact distinct count within rsd") {
    import spark.implicits._
    // approximate aggregates stay out of the oracle set (SURVEY §2.3);
    // cross-check them against the exact answer here instead
    val both = Tables.lineitem(spark, sfDir).agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey", 0.02).as("approx"),
      approx_count_distinct($"l_partkey").as("approx_default"))
      .head()
    val exact = both.getAs[Long]("exact").toDouble
    assert(math.abs(both.getAs[Long]("approx") - exact) / exact < 0.1)
    assert(math.abs(both.getAs[Long]("approx_default") - exact) / exact < 0.15)
  }

  test("approx percentile brackets the exact median") {
    import spark.implicits._
    val med = q("q_median").filter($"c_mktsegment" === "BUILDING")
      .select($"median_acctbal").as[Double].head()
    val Array(lo, hi) = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING")
      .agg(percentile_approx($"c_acctbal", lit(0.4), lit(1000)),
        percentile_approx($"c_acctbal", lit(0.6), lit(1000)))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(med >= lo && med <= hi)
  }

  test("histogram buckets partition all orders with consistent bounds") {
    import spark.implicits._
    val out = q("q_histogram")
    assert(out.agg(sum($"n_orders")).as[Long].head() ==
      Tables.orders(spark, sfDir).count())
    assert(out.filter($"hi" =!= $"lo" + 50000L || $"n_orders" <= 0).count() == 0)
  }

  test("equidepth: 4 near-equal buckets per priority, ranges ordered, covers all") {
    import spark.implicits._
    val out = q("q_equidepth").cache()
    assert(out.agg(sum($"n_orders")).as[Long].head() ==
      Tables.orders(spark, sfDir).count())
    // every priority has buckets 1..4 and |max - min| bucket size <= 1
    val perPrio = out.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("nb"), min($"n_orders").as("small"),
        max($"n_orders").as("big"))
    assert(perPrio.filter($"nb" =!= 4 || $"big" - $"small" > 1).count() == 0)
    // bucket value ranges are non-overlapping and ordered within a priority
    val rows = out.orderBy($"o_orderpriority", $"bucket")
      .collect().groupBy(_.getAs[String]("o_orderpriority"))
    rows.values.foreach { bs =>
      bs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
        case _ =>
      }
      bs.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
    }
    out.unpersist()
  }

  test("contingency: margins consistent, expected sums to N, contributions >= 0") {
    import spark.implicits._
    val rows = q("q_contingency").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("observed")).sum
    // expected counts sum back to N (up to per-cell rounding)
    val eSum = rows.map(_.getAs[Double]("expected")).sum
    assert(math.abs(eSum - n) < 1e-3 * n)
    assert(rows.forall(_.getAs[Double]("contribution") >= 0.0))
    // spot-check one cell's expectation from the margins
    val bySeg = rows.groupBy(_.getAs[String]("segment"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("observed")).sum }
    val byPrio = rows.groupBy(_.getAs[String]("priority"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("observed")).sum }
    val cell = rows.head
    val want = bySeg(cell.getAs[String]("segment")).toDouble *
      byPrio(cell.getAs[String]("priority")) / n
    assert(math.abs(cell.getAs[Double]("expected") - want) < 1e-4)
  }

  test("pct change: reconstructs each day's revenue from the previous day") {
    import spark.implicits._
    val rows = q("q_pct_change").orderBy($"day").collect()
    assert(rows.length > 1)
    // first present day has no predecessor
    assert(rows.head.isNullAt(rows.head.fieldIndex("change")))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val prev = a.getAs[Double]("revenue")
        val cur = b.getAs[Double]("revenue")
        assert(math.abs((cur - prev) - b.getAs[Double]("change")) < 1e-6)
        val expectPct = math.round((cur - prev) / prev * 1e6) / 1e6
        assert(math.abs(b.getAs[Double]("pct_change") - expectPct) < 1e-6)
      case _ =>
    }
  }

  test("gini: in [0,1); 0 on equal toy spends, high on concentrated ones") {
    import spark.implicits._
    val out = q("q_gini").collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val g = r.getAs[Double]("gini"); g >= 0.0 && g < 1.0
    })
    // toy closed forms through the same algebra: equal spends -> 0;
    // one customer holding everything -> (n-1)/n
    def gini(spends: Seq[Long]): Double = {
      val xs = spends.sorted
      val n = xs.length
      val s = xs.sum.toDouble
      val si = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum.toDouble
      2.0 * si / (n * s) - (n + 1.0) / n
    }
    assert(math.abs(gini(Seq(100L, 100L, 100L, 100L))) < 1e-12)
    assert(math.abs(gini(Seq(0L, 0L, 0L, 400L)) - 0.75) < 1e-12)
  }

  test("winsorize: clipped mean sits inside [p5,p95] and damps planted outliers") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val out = q("q_winsorize")
    // counts match, and each winsorized mean lies within the segment's raw range
    val bounds = Tables.customer(spark, sfDir).groupBy("c_mktsegment")
      .agg(min($"c_acctbal").as("lo"), max($"c_acctbal").as("hi"),
        count(lit(1)).as("n"))
    assert(out.join(bounds, "c_mktsegment")
      .filter($"winsorized_mean" < $"lo" || $"winsorized_mean" > $"hi" ||
        $"n_customers" =!= $"n").count() == 0)
    // toy: one absurd outlier among flat values barely moves the
    // winsorized mean (same plan shape, exact expectation)
    val toy = (1 to 99).map(i => ("S", 100.0, i.toLong)) :+ ("S", 1e9, 100L)
    val df = toy.toDF("c_mktsegment", "c_acctbal", "c_custkey")
    val w = Window.partitionBy("c_mktsegment")
      .orderBy($"c_acctbal".asc, $"c_custkey".asc)
    val b = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("c_mktsegment")))
      .groupBy($"c_mktsegment".as("b_seg"))
      .agg(
        max(when($"rn" === ceil($"n" * 5 / 100.0),
          round($"c_acctbal" * 100).cast("long"))).as("lo_c"),
        max(when($"rn" === ceil($"n" * 95 / 100.0),
          round($"c_acctbal" * 100).cast("long"))).as("hi_c"))
    val m = df.join(broadcast(b), $"c_mktsegment" === $"b_seg")
      .select(greatest($"lo_c", least($"hi_c",
        round($"c_acctbal" * 100).cast("long"))).as("clip_c"))
      .agg((sum($"clip_c").cast("double") / 100.0 / count(lit(1))))
      .as[Double].head()
    // p95 = value at rank 95 = 100.0, so the outlier clips to 100.0 exactly
    assert(m == 100.0)
  }

  test("mann-whitney: doubled U matches a local average-rank computation") {
    import spark.implicits._
    val r = operators.StatsQueries.qMannwhitney(spark, sfDir).head()
    val ev = Tables.events(spark, sfDir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_type", $"value").as[(String, Double)].collect()
    val sorted = ev.sortBy(_._2)
    // doubled average rank per row: for a tie group over ranks
    // [lo..hi], each member gets lo + hi
    val n = sorted.length
    val ranks2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && sorted(j + 1)._2 == sorted(i)._2) j += 1
      val r2 = (i + 1).toLong + (j + 1).toLong
      (i to j).foreach(k => ranks2(k) = r2)
      i = j + 1
    }
    val nA = sorted.count(_._1 == "click").toLong
    val r1x2 = sorted.zip(ranks2).filter(_._1._1 == "click").map(_._2).sum
    val uAx2 = r1x2 - nA * (nA + 1)
    assert(r.getAs[Long]("n_a") == nA)
    assert(r.getAs[Long]("u_a_x2") == uAx2)
    val rb = r.getAs[Double]("rank_biserial")
    assert(rb >= -1.0 - 1e-9 && rb <= 1.0 + 1e-9)
  }

  test("cramers v: chi2 total reconciles the contingency cells; V in [0,1]") {
    val v = operators.StatsQueries.qCramersV(spark, sfDir).head()
    val cells = q("q_contingency").collect()
    val chi2FromCells = cells.map(_.getAs[Double]("contribution")).sum
    // each of the 25 cells rounds at 6 dp independently in the
    // contingency view and at the micro grid here — drift ≤ cells·1e-6
    assert(math.abs(v.getAs[Double]("chi2") - chi2FromCells) <
      cells.length * 1e-6 + 1e-6)
    assert(v.getAs[Long]("n") == cells.map(_.getAs[Long]("observed")).sum)
    val cv = v.getAs[Double]("cramers_v")
    assert(cv >= 0.0 && cv <= 1.0)
  }

  test("runs test: run count bounded by sign count; rows conserve the off-median days") {
    import spark.implicits._
    val out = operators.StatsQueries.qRunsTest(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b, runs) = (r.getAs[Long]("n_above"), r.getAs[Long]("n_below"),
        r.getAs[Long]("n_runs"))
      assert(runs >= 1 && runs <= a + b)
      // at most one more run than twice the rarer sign's count
      assert(runs <= 2 * math.min(a, b) + 1)
      val er = r.getAs[Double]("expected_runs")
      assert(er >= 1.0 && er <= a + b)
    }
  }

  test("ks test: D matches a local ECDF sweep and sits in [0,1]") {
    import spark.implicits._
    val r = operators.StatsQueries.qKsTest(spark, sfDir).head()
    val ev = Tables.events(spark, sfDir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_type", $"value").as[(String, Double)].collect()
    val a = ev.filter(_._1 == "click").map(_._2).sorted
    val b = ev.filter(_._1 == "purchase").map(_._2).sorted
    val values = (a ++ b).distinct.sorted
    val gaps = values.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      math.abs(ca * b.length - cb * a.length)
    }
    val d = gaps.max.toDouble / (a.length.toLong * b.length)
    assert(math.abs(r.getAs[Double]("d_stat") - d) < 1e-5)
    assert(r.getAs[Double]("d_stat") >= 0.0 && r.getAs[Double]("d_stat") <= 1.0)
  }

  test("welch t: matches a local two-sample computation to 1e-4; df within classical bounds") {
    import spark.implicits._
    val Seq(r) = q("q_welch_t").collect().toSeq
    val ev = Tables.events(spark, sfDir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_type", $"value").as[(String, Double)].collect()
    def stats(s: Array[Double]) = {
      val n = s.length; val m = s.sum / n
      (n, m, s.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = stats(ev.filter(_._1 == "click").map(_._2))
    val (nb, mb, vb) = stats(ev.filter(_._1 == "purchase").map(_._2))
    val (seA, seB) = (va / na, vb / nb)
    val t = (ma - mb) / math.sqrt(seA + seB)
    val df = (seA + seB) * (seA + seB) /
      (seA * seA / (na - 1) + seB * seB / (nb - 1))
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-3,
      s"t ${r.getAs[Double]("t_stat")} vs local $t")
    val dfOut = r.getAs[Double]("df")
    assert(math.abs(dfOut - df) < math.abs(df) * 1e-3 + 1e-3)
    assert(dfOut >= math.min(na, nb) - 1 - 1e-6 && dfOut <= na + nb - 2 + 1e-6)
  }

  test("wilson: lower bound strictly below p-hat, shrinks gap with n, in [0,1]") {
    val out = q("q_wilson").collect()
    assert(out.length == 100)
    out.foreach { r =>
      val (p, lb, n) = (r.getAs[Double]("p_hat"),
        r.getAs[Double]("wilson_lb"), r.getAs[Long]("n_items"))
      assert(lb >= 0.0 && lb <= 1.0)
      assert(lb < p + 1e-9, s"bound $lb not below estimate $p")
      assert(n >= 20L)
    }
    val lbs = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("wilson_lb"))
    assert(lbs.zip(lbs.tail).forall { case (a, b) => a >= b })
  }

  test("hhi: per-nation index between 1/n and 1; single-supplier nations hit 1") {
    val out = q("q_hhi").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_suppliers")
      val h = r.getAs[Double]("hhi")
      assert(h >= 1.0 / n - 1e-6, s"hhi $h below even-market floor 1/$n")
      assert(h <= 1.0 + 1e-9)
      if (n == 1) assert(math.abs(h - 1.0) < 1e-6)
    }
  }

  test("lorenz: 10 deciles, shares sum to 1, cumulative share convex-ordered") {
    val out = q("q_lorenz").collect().sortBy(_.getAs[Int]("decile"))
    assert(out.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    assert(out.map(_.getAs[Long]("n_customers")).sum ==
      Tables.orders(spark, sfDir).select("o_custkey").distinct().count())
    val shareSum = out.map(_.getAs[Double]("spend_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    assert(math.abs(out.last.getAs[Double]("cum_share") - 1.0) < 1e-6)
    // deciles are ascending-spend, so shares must be nondecreasing
    val shares = out.map(_.getAs[Double]("spend_share")).toSeq
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-6 })
    val cums = out.map(_.getAs[Double]("cum_share")).toSeq
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-9 })
  }

  test("kruskal-wallis: rank-sum identity, tie bounds, H replays nonnegative") {
    val out = SparkEntry.queries("q_kruskal_wallis")(spark, sfDir).collect()
    val n = out.head.getAs[Long]("n_total")
    assert(out.map(_.getAs[Long]("n_g")).sum == n)
    // Σ midranks = N(N+1)/2, so the doubled rank sums total N(N+1)
    assert(out.map(_.getAs[Long]("r2_g")).sum == n * (n + 1))
    val tie = out.head.getAs[Long]("tie_sum")
    assert(tie >= 0 && tie < n * n * n - n)
    // the reader's H from the sufficient statistics: nonnegative and
    // finite after tie correction
    val h = 12.0 / (n.toDouble * (n + 1)) * out.map { r =>
      val rg = r.getAs[Long]("r2_g").toDouble / 2
      rg * rg / r.getAs[Long]("n_g")
    }.sum - 3.0 * (n + 1)
    val c = 1.0 - tie.toDouble / (n.toDouble * n * n - n)
    assert(h >= -1e-6, s"H $h negative")
    assert(c > 0 && (h / c).isFinite)
  }

  test("emd: equals a local ECDF-area replay with the same micro rounding") {
    val r = SparkEntry.queries("q_emd")(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val na = ev.count(_._1 == "click").toLong
    val nb = ev.length - na
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    val byV = ev.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (v, xs) => (v, xs.count(_._1 == "click").toLong,
        xs.count(_._1 == "purchase").toLong) }
    var (ca, cb) = (0L, 0L)
    val terms = byV.zip(byV.tail).map { case ((v, a, b), (v2, _, _)) =>
      ca += a; cb += b
      math.round(math.abs(ca * nb - cb * na).toDouble /
        (na * nb).toDouble * (v2 - v) * 1e6)
    }
    assert(r.getAs[Long]("n_segments") == terms.length)
    assert(math.abs(r.getAs[Double]("emd") - terms.sum / 1e6) < 1e-6)
    assert(r.getAs[Double]("emd") >= 0)
  }

  test("partial corr: raw r's match built-in corr; partial re-derives and is bounded") {
    val out = SparkEntry.queries("q_partial_corr")(spark, sfDir).collect()
    val ref = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").cast("double").as("x"),
        round(col("l_extendedprice") * 100).cast("long").cast("double").as("y"),
        round(col("l_discount") * 1000000).cast("long").cast("double").as("z"))
      .groupBy("l_returnflag")
      .agg(corr(col("x"), col("y")).as("rxy"), corr(col("x"), col("z")).as("rxz"),
        corr(col("y"), col("z")).as("ryz"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    out.foreach { r =>
      val (exy, exz, eyz) = ref(r.getAs[String]("l_returnflag"))
      assert(math.abs(r.getAs[Double]("r_xy") - exy) < 1e-4)
      assert(math.abs(r.getAs[Double]("r_xz") - exz) < 1e-4)
      assert(math.abs(r.getAs[Double]("r_yz") - eyz) < 1e-4)
      val p = r.getAs[Double]("partial_r")
      assert(p >= -1.0 - 1e-9 && p <= 1.0 + 1e-9)
      val expect = (exy - exz * eyz) /
        (math.sqrt(1 - exz * exz) * math.sqrt(1 - eyz * eyz))
      assert(math.abs(p - expect) < 1e-3, s"partial $p vs $expect")
    }
  }

  test("ols2: multiple R2 bounded and never below either simple R2") {
    val out = SparkEntry.queries("q_ols2")(spark, sfDir).collect()
    val ref = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").cast("double").as("x1"),
        round(col("l_discount") * 1000000).cast("long").cast("double").as("x2"),
        round(col("l_extendedprice") * 100).cast("long").cast("double").as("y"))
      .groupBy("l_returnflag")
      .agg(corr(col("x1"), col("y")).as("r1"), corr(col("x2"), col("y")).as("r2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val m = r.getAs[Double]("r2")
      assert(m >= 0 && m <= 1 + 1e-9, s"R2 $m")
      val (r1, r2) = ref(r.getAs[String]("l_returnflag"))
      // adding a regressor never reduces R²
      assert(m >= r1 * r1 - 1e-6 && m >= r2 * r2 - 1e-6,
        s"multiple R2 $m below a simple R2 (${r1 * r1}, ${r2 * r2})")
    }
  }

  test("hill tail: matches a local replay of the top-k order statistics") {
    val r = SparkEntry.queries("q_hill_tail")(spark, sfDir).collect().head
    val k = operators.StatsQueries.HillK
    assert(r.getAs[Long]("k") == k)
    // local replay: same cents, same (desc, key asc) cut, same
    // micro-nat term rounding
    val all = Tables.orders(spark, sfDir)
      .select(round(col("o_totalprice") * 100).cast("long").as("c"),
        col("o_orderkey"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy { case (c, key) => (-c, key) }
    val ref = all(k)._1
    assert(r.getAs[Long]("x_ref_cents") == ref)
    val sumLog = all.take(k)
      .map { case (c, _) => math.round(math.log(c.toDouble / ref) * 1e6) }
      .sum
    assert(r.getAs[Long]("sum_log_micro") == sumLog)
    val alpha = r.getAs[Double]("tail_index")
    assert(alpha > 0 && math.abs(alpha - k * 1e6 / sumLog) < 1e-6)
  }

  test("levene: matches a double-precision replay off exact medians") {
    val r = SparkEntry.queries("q_levene")(spark, sfDir).collect().head
    val groups = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("x"))
      .collect()
      .groupBy(_.getString(0)).values.map(_.map(_.getLong(1)).sorted)
    assert(r.getAs[Long]("k_groups") == groups.size)
    assert(r.getAs[Long]("n_total") == groups.map(_.length).sum)
    // replay: doubled median, abs deviations, classic one-way F
    val devs = groups.map { xs =>
      val n = xs.length
      val m2 = if (n % 2 == 1) 2 * xs(n / 2) else xs(n / 2 - 1) + xs(n / 2)
      xs.map(x => math.abs(2 * x - m2).toDouble)
    }.toSeq
    val all = devs.flatten
    val grand = all.sum / all.size
    val ssb = devs.map(d => d.size * math.pow(d.sum / d.size - grand, 2)).sum
    val ssw = devs.map(d => { val m = d.sum / d.size
      d.map(x => math.pow(x - m, 2)).sum }).sum
    val f = (ssb / (devs.size - 1)) / (ssw / (all.size - devs.size))
    assert(math.abs(r.getAs[Double]("bf_stat") - f) < 1e-3,
      s"bf_stat ${r.getAs[Double]("bf_stat")} vs replay $f")
  }

  test("bartlett: matches a double-precision replay off sample variances") {
    val r = SparkEntry.queries("q_bartlett")(spark, sfDir).collect().head
    val groups = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("x"))
      .collect()
      .groupBy(_.getString(0)).values.map(_.map(_.getLong(1).toDouble))
      .toSeq
    val k = groups.size
    val n = groups.map(_.length).sum
    assert(r.getAs[Long]("k_groups") == k && r.getAs[Long]("n_total") == n)
    def varS(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val sp2 = groups.map(g => (g.length - 1) * varS(g)).sum / (n - k)
    val num = (n - k) * math.log(sp2) -
      groups.map(g => (g.length - 1) * math.log(varS(g))).sum
    val c = 1.0 + (groups.map(g => 1.0 / (g.length - 1)).sum -
      1.0 / (n - k)) / (3.0 * (k - 1))
    assert(math.abs(r.getAs[Double]("pooled_var") - sp2) < 1e-2 * sp2)
    // the engine rounds each ln(S_g²) to micro-nats before the
    // (n_g−1)-weighted sum, so the replay can differ by up to
    // Σ(n_g−1)·0.5e-6 ≈ n·0.5e-6
    assert(math.abs(r.getAs[Double]("bartlett_chi2") - num / c) <
      1e-6 * n + 1e-6,
      s"chi2 ${r.getAs[Double]("bartlett_chi2")} vs replay ${num / c}")
  }

  test("qq plot: 19 quantile rows, each sample column monotone in pct") {
    val rows = SparkEntry.queries("q_qq_plot")(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("pct"))
    assert(rows.map(_.getAs[Int]("pct")).toSeq == (1 to 19).map(_ * 5))
    def mono(c: String) = {
      val vs = rows.map(_.getAs[Double](c))
      vs.zip(vs.tail).forall { case (a, b) => a <= b + 1e-9 }
    }
    assert(mono("click_value"), "click quantiles not monotone")
    assert(mono("purchase_value"), "purchase quantiles not monotone")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("qq_diff") -
        (r.getAs[Double]("purchase_value") -
          r.getAs[Double]("click_value"))) < 2e-6)
    }
  }

  test("tukey: 10 ordered pairs, antisymmetric diffs, t = |diff|/se") {
    val rows = SparkEntry.queries("q_tukey")(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[String]("g1") < r.getAs[String]("g2"))
      val (d, se, t) = (r.getAs[Double]("mean_diff"), r.getAs[Double]("se"),
        r.getAs[Double]("t_stat"))
      assert(se > 0)
      assert(math.abs(t - math.abs(d) / se) < 1e-3, s"t $t vs ${d / se}")
    }
    // the pair grid covers every priority exactly 4 times
    val names = rows.flatMap(r =>
      Seq(r.getAs[String]("g1"), r.getAs[String]("g2")))
    assert(names.groupBy(identity).values.forall(_.length == 4))
  }

  test("cohens d: matches a double-precision replay; g shrinks d") {
    val r = SparkEntry.queries("q_cohens_d")(spark, sfDir).collect().head
    val samples = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("x"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1).toDouble)).toMap
    val (a, b) = (samples("click"), samples("purchase"))
    def varS(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(v => (v - m) * (v - m)).sum / (xs.length - 1)
    }
    val sp = math.sqrt(((a.length - 1) * varS(a) + (b.length - 1) * varS(b)) /
      (a.length + b.length - 2)) / 100.0
    val d = (b.sum / b.length / 100.0 - a.sum / a.length / 100.0) / sp
    assert(r.getAs[Long]("n_click") == a.length)
    assert(r.getAs[Long]("n_purchase") == b.length)
    assert(math.abs(r.getAs[Double]("cohens_d") - d) < 1e-3,
      s"d ${r.getAs[Double]("cohens_d")} vs replay $d")
    assert(math.abs(r.getAs[Double]("hedges_g")) <=
      math.abs(r.getAs[Double]("cohens_d")))
  }

  test("cond entropy: information inequalities hold; U consistent") {
    val r = SparkEntry.queries("q_cond_entropy")(spark, sfDir).collect().head
    val (hx, hxy, u) = (r.getAs[Double]("h_type"),
      r.getAs[Double]("h_type_given_hour"), r.getAs[Double]("theils_u"))
    val k = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    // 0 <= H(X|Y) <= H(X) <= ln k  (conditioning never adds entropy)
    assert(hxy >= -1e-6 && hxy <= hx + 1e-4, s"H(X|Y) $hxy vs H(X) $hx")
    assert(hx <= math.log(k.toDouble) + 1e-4)
    assert(u >= -1e-4 && u <= 1.0 + 1e-9)
    assert(math.abs(u - (1.0 - hxy / hx)) < 1e-4)
  }

  test("bootstrap ci: brackets the full-sample mean with a sane width") {
    val r = SparkEntry.queries("q_bootstrap_ci")(spark, sfDir).collect().head
    val (lo, hi, m) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
      r.getAs[Double]("mean_total"))
    assert(lo <= hi)
    // 95% CI of the mean should bracket the point estimate
    assert(lo <= m && m <= hi, s"mean $m outside [$lo, $hi]")
    // width sanity: nonzero but well under the mean for n in the
    // thousands (a broken weight column collapses the width to 0)
    assert(hi - lo > 0, "degenerate zero-width interval")
    assert((hi - lo) / m < 0.5, s"implausibly wide CI [$lo, $hi]")
    assert(r.getAs[Int]("n_reps") == 40)
  }
}
