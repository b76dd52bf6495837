package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the composite multi-join analytics (TPC-H Q3/Q5
  * shapes, A/B analysis, snapshot diff): the oracle proves row
  * equality; these pin the semantic algebra and the broadcast-dimension
  * plan shape the 100 TB story depends on.
  */
class CompositeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case n => n +: n.children.flatMap(flatten)
  }

  test("shipping priority: 10 rows max, revenue descending, dates respect the cutoff") {
    import spark.implicits._
    val df = q("q_shipping_priority").cache()
    val rows = df.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(df.filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp")).count() == 0)
    df.unpersist()
  }

  test("shipping priority: dimensions broadcast, fact never builds") {
    val joins = flatten(q("q_shipping_priority").queryExecution.executedPlan)
      .collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, "expected at least one broadcast hash join")
  }

  test("regional volume: one row per nation with local-supplier sales, revenue positive") {
    import spark.implicits._
    val r = q("q_regional_volume").cache()
    val asiaNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey").count()
    assert(r.count() <= asiaNations)
    assert(r.filter($"revenue" <= 0).count() == 0)
    assert(r.select("n_name").distinct().count() == r.count())
    r.unpersist()
  }

  test("ab assign: partition of the user base, rates in range, deterministic") {
    import spark.implicits._
    val r = q("q_ab_assign").cache()
    assert(r.count() == 2)
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(r.agg(sum($"n_users")).head().getLong(0) == users)
    assert(r.filter($"conversion" < 0 || $"conversion" > 1).count() == 0)
    assert(r.filter($"n_purchasers" > $"n_users").count() == 0)
    val again = q("q_ab_assign")
    assert(r.exceptAll(again).count() == 0 && again.exceptAll(r).count() == 0)
    r.unpersist()
  }

  test("snapshot diff: statuses match the deterministic carve") {
    import spark.implicits._
    val d = q("q_snapshot_diff").cache()
    val bad = d.filter(!$"status".isin("added", "removed", "changed")).count()
    assert(bad == 0)
    // added = in B only: doc_id % 7 == 0 && % 5 != 0
    val added = d.filter($"status" === "added")
    assert(added.filter($"doc_id" % 7 =!= 0 || $"doc_id" % 5 === 0).count() == 0)
    // removed = in A only: % 5 == 0 && % 7 != 0
    val removed = d.filter($"status" === "removed")
    assert(removed.filter($"doc_id" % 5 =!= 0 || $"doc_id" % 7 === 0).count() == 0)
    // changed = in both with the 11th-doc revision
    val changed = d.filter($"status" === "changed")
    assert(changed.filter($"doc_id" % 11 =!= 0).count() == 0)
    assert(changed.filter($"doc_id" % 7 === 0 || $"doc_id" % 5 === 0).count() == 0)
    // and every 11th doc present in both snapshots IS reported changed
    val expectChanged = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 11 === 0 && $"doc_id" % 7 =!= 0 && $"doc_id" % 5 =!= 0)
      .count()
    assert(changed.count() == expectChanged)
    d.unpersist()
  }

  test("idle rich: every kept customer is above average and urgent-free") {
    import spark.implicits._
    val out = q("q_idle_rich").collect()
    assert(out.nonEmpty)
    // recompute the population directly: above-average positive balances
    // minus urgent-order customers, by segment
    val cust = Tables.customer(spark, sfDir).filter($"c_acctbal" > 0.0)
      .select($"c_custkey", $"c_mktsegment",
        round($"c_acctbal" * 100).cast("long").as("bal_c"))
    val (s, n) = {
      val r = cust.agg(sum($"bal_c"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val urgentKeys = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().as[Long].collect().toSet
    val expect = cust.collect()
      .filter(r => r.getAs[Long]("bal_c") * n > s)
      .filterNot(r => urgentKeys.contains(r.getAs[Long]("c_custkey")))
      .groupBy(_.getAs[String]("c_mktsegment"))
      .map { case (seg, rs) =>
        (seg, rs.length.toLong, rs.map(_.getAs[Long]("bal_c")).sum / 100.0) }
      .toSet
    val got = out.map(r => (r.getAs[String]("c_mktsegment"),
      r.getAs[Long]("n_cust"), r.getAs[Double]("total_bal"))).toSet
    assert(got == expect)
  }

  test("small parts: window form equals the aggregate-then-join form exactly") {
    import spark.implicits._
    // independent recompute with a DIFFERENT plan shape: per-part agg +
    // join back (instead of the window), same integer predicate
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_quantity".cast("long").as("qty"),
        round($"l_extendedprice" * 100).cast("long").as("price_c"))
    val stats = li.groupBy($"l_partkey".as("s_partkey"))
      .agg(sum($"qty").as("part_qty"), count(lit(1)).as("part_cnt"))
    val expect = li.join(stats, $"l_partkey" === $"s_partkey")
      .filter($"qty" * $"part_cnt" * 5 < $"part_qty")
      .join(Tables.part(spark, sfDir).select("p_partkey", "p_brand"),
        $"l_partkey" === $"p_partkey")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        (sum($"price_c").cast("double") / 100.0).as("small_revenue"))
    val got = q("q_small_parts")
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("small parts: lineitem scanned exactly once (window form, no agg-self-join)") {
    val scans = flatten(q("q_small_parts").queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains("lineitem")))
    assert(scans.size == 1, s"expected 1 lineitem scan, got ${scans.size}")
  }

  test("big orders: every row clears the HAVING, matches a recomputed sum, sorted") {
    import spark.implicits._
    val rows = q("q_big_orders").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[Long]("total_qty") > 300))
    // sorted by o_totalprice desc with o_orderkey tiebreak
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    // spot-check one order's quantity sum against a direct aggregation
    val k = rows.head.getAs[Long]("o_orderkey")
    val direct = Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey" === k)
      .agg(sum($"l_quantity".cast("long"))).as[Long].head()
    assert(direct == rows.head.getAs[Long]("total_qty"))
  }

  test("trade volume: cross-nation pairs only, years in window, revenue conserved") {
    import spark.implicits._
    val out = q("q_trade_volume").cache()
    assert(out.filter($"supp_nation" === $"cust_nation").count() == 0)
    assert(out.filter($"l_year" < 1996 || $"l_year" > 1997).count() == 0)
    assert(out.filter($"revenue" <= 0).count() == 0)
    // total revenue over the output = direct recompute of the same
    // filtered fact join (conservation, no dup/drop through the chain)
    val total = out.agg(sum($"revenue")).as[Double].head()
    val li = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_suppkey",
        (round($"l_extendedprice" * 100).cast("long") *
          round((lit(1.0) - $"l_discount") * 100).cast("long")).as("rev"))
    val sn = Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_nationkey")
    val cn = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
      .join(Tables.customer(spark, sfDir)
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
    val direct = li.join(sn, $"l_suppkey" === $"s_suppkey")
      .join(cn, $"l_orderkey" === $"o_orderkey")
      .filter($"s_nationkey" =!= $"c_nationkey")
      .agg((sum($"rev").cast("double") / 10000.0)).as[Double].head()
    assert(math.abs(total - direct) <= 1e-4 * math.max(1.0, direct))
    out.unpersist()
  }

  test("q_supplier_balance: region shares sum to 1; suppliers conserved") {
    val rows = SparkEntry.queries("q_supplier_balance")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_suppliers")).sum ==
      Tables.supplier(spark, sfDir).count())
    rows.groupBy(_.getAs[String]("region")).values.foreach { g =>
      assert(math.abs(g.map(_.getAs[Double]("region_share")).sum - 1.0)
        < 1e-4)
    }
  }

  test("q_brand_prices: ordered min/median/max; parts conserved") {
    val rows = SparkEntry.queries("q_brand_prices")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_parts")).sum ==
      Tables.part(spark, sfDir).count())
    rows.foreach { r =>
      val (mn, md, mx) = (r.getAs[Double]("min_price"),
        r.getAs[Double]("median_price"), r.getAs[Double]("max_price"))
      assert(mn <= md + 1e-9 && md <= mx + 1e-9, s"$mn / $md / $mx")
      assert(math.abs(r.getAs[Double]("price_spread") - (mx - mn)) < 2e-6)
    }
  }

  test("q_brand_returns: lines conserved; shares bounded") {
    val rows = SparkEntry.queries("q_brand_returns")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_lines")).sum ==
      Tables.lineitem(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_returned") <= r.getAs[Long]("n_lines"))
      assert(r.getAs[Double]("return_rate") >= 0 &&
        r.getAs[Double]("return_rate") <= 1)
      assert(r.getAs[Double]("returned_value_share") >= 0 &&
        r.getAs[Double]("returned_value_share") <= 1)
    }
  }

  test("q_discount_revenue: matches an exact local replay of the Q6 filter") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q_discount_revenue")(spark, sfDir)
      .collect().head
    val rows = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(round(col("l_extendedprice") * 100).cast("long").as("pc"),
        round(col("l_discount") * 10000).cast("long").as("bp"))
      .collect()
    assert(r.getAs[Long]("n_lines") == rows.length)
    val expect = rows.map(x => BigInt(x.getLong(0)) * x.getLong(1)).sum
    assert(math.abs(r.getAs[Double]("promo_revenue") -
      expect.toDouble / 1e6) < 1e-2)
  }

  test("q_lines_per_order: orders conserved; shares sum to 1") {
    val rows = SparkEntry.queries("q_lines_per_order")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.lineitem(spark, sfDir).select("l_orderkey").distinct().count())
    assert(math.abs(rows.map(_.getAs[Double]("order_share")).sum - 1.0)
      < 1e-4)
  }

  test("q_discount_elasticity: r bounded; slope/r share a sign; lines conserved") {
    val rows = SparkEntry.queries("q_discount_elasticity")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_lines")).sum ==
      Tables.lineitem(spark, sfDir).count())
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("r"))) {
        val (s, cr) = (r.getAs[Double]("qty_per_discount_pt"),
          r.getAs[Double]("r"))
        assert(cr >= -1.0 - 1e-9 && cr <= 1.0 + 1e-9, s"r $cr")
        assert(s == 0 || cr == 0 || s.sign == cr.sign,
          s"slope $s and r $cr disagree in sign")
      }
    }
  }

  test("q_basket_by_segment: orders conserved; line-value identity holds") {
    val rows = SparkEntry.queries("q_basket_by_segment")(spark, sfDir)
      .collect()
    // baskets are orders WITH line items (inner join by design — the
    // fixture contains line-less orders, which have no basket)
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.lineitem(spark, sfDir).select("l_orderkey").distinct().count())
    rows.foreach { r =>
      val (ml, mr, mlv) = (r.getAs[Double]("mean_lines"),
        r.getAs[Double]("mean_revenue"), r.getAs[Double]("mean_line_value"))
      assert(ml >= 1.0 - 1e-9)
      // mean_revenue = mean_lines · mean_line_value (same exact totals)
      assert(math.abs(mr - ml * mlv) < mr * 1e-3 + 1e-3,
        s"$mr vs $ml * $mlv")
    }
  }

  test("q_weekend_effect: day split conserves orders; ratio re-derives") {
    val rows = SparkEntry.queries("q_weekend_effect")(spark, sfDir).collect()
    assert(rows.map(r => r.getAs[Long]("n_weekday") +
      r.getAs[Long]("n_weekend")).sum ==
      Tables.orders(spark, sfDir).count())
    rows.foreach { r =>
      val (wd, we, ratio) = (r.getAs[Double]("weekday_mean"),
        r.getAs[Double]("weekend_mean"), r.getAs[Double]("weekend_ratio"))
      assert(wd > 0 && we > 0)
      assert(math.abs(ratio - we / wd) < 1e-3, s"ratio $ratio vs ${we / wd}")
    }
  }

  test("q_len_by_lang: docs conserved; ordered mean-bracketing quantiles") {
    val rows = SparkEntry.queries("q_len_by_lang")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val (med, p90) = (r.getAs[Long]("median_tokens"),
        r.getAs[Long]("p90_tokens"))
      assert(med >= 0 && med <= p90, s"median $med > p90 $p90")
      assert(r.getAs[Double]("mean_tokens") > 0)
    }
  }

  test("q_priority_mix: shares sum to 1 per month; deltas telescope") {
    val rows = SparkEntry.queries("q_priority_mix")(spark, sfDir).collect()
    val byMonth = rows.groupBy(_.getAs[java.sql.Timestamp]("month"))
    byMonth.values.foreach { g =>
      assert(math.abs(g.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    }
    // per priority, the delta equals this month's share minus last's
    rows.groupBy(_.getAs[String]("o_orderpriority")).values.foreach { g =>
      val ordered = g.sortBy(_.getAs[java.sql.Timestamp]("month").getTime)
      assert(ordered.head.isNullAt(ordered.head.fieldIndex("mom_delta")))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(math.abs(b.getAs[Double]("mom_delta") -
            (b.getAs[Double]("share") - a.getAs[Double]("share"))) < 2e-6)
        case _ =>
      }
    }
  }
}
