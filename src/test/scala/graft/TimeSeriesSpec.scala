package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the batch time-series diagnostics (autocorrelation,
  * day-of-week seasonality, CUSUM changepoint), the prefix-filtered
  * set-similarity join, and the round's corpus-signal queries
  * (duplicated-ngram fraction, bigram LM).
  */
class TimeSeriesSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("setsim prefix filter loses no pair vs the brute-force join") {
    import spark.implicits._
    // ground truth: all-pairs shingle join, no prefix filter
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), operators.TextQueries.tokens(col("text")).as("ts"))
      .filter(size($"ts") >= 2)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size($"ts") - 1),
          i => concat_ws(" ", element_at($"ts", i), element_at($"ts", i + 1)))))
        .as("s"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.as("a").join(sh.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("o"))
      .join(sz.select($"doc_id".as("d1"), $"n".as("n1")), "d1")
      .join(sz.select($"doc_id".as("d2"), $"n".as("n2")), "d2")
      .filter($"o" * 3 >= $"n1" + $"n2")
      .select($"d1", $"d2", $"o").as[(Long, Long, Long)].collect().toSet
    val pref = q("q_setsim_prefix")
      .select($"doc_id_1", $"doc_id_2", $"n_common")
      .as[(Long, Long, Long)].collect().toSet
    assert(pref == brute)
    assert(pref.nonEmpty) // fixture has exact dup pairs -> J = 1
  }

  test("setsim jaccard bounds and symmetry of the pair key") {
    import spark.implicits._
    val out = q("q_setsim_prefix")
    assert(out.filter($"jaccard" < 0.5 - 1e-9 || $"jaccard" > 1.0 + 1e-9).count() == 0)
    assert(out.filter($"doc_id_1" >= $"doc_id_2").count() == 0)
  }

  test("dup-ngram fraction: bounds hold and exact duplicates score 1.0") {
    import spark.implicits._
    val out = q("q_dup_ngram_frac")
    assert(out.filter($"n_dup" > $"n_ngrams" || $"n_dup" < 0).count() == 0)
    assert(out.filter($"dup_frac" < 0.0 || $"dup_frac" > 1.0).count() == 0)
    // every member of a byte-exact duplicate group shares ALL its
    // 5-grams with its twin, so dup_frac must be exactly 1.0
    val dupGroups = q("q_dedup_exact").filter($"n_dups" >= 2)
    if (dupGroups.count() > 0) {
      val dupIds = Tables.documents(spark, sfDir)
        .groupBy("text").agg(collect_list($"doc_id").as("ids"), count(lit(1)).as("n"))
        .filter($"n" >= 2).select(explode($"ids").as("doc_id"))
      val offenders = out.join(dupIds, "doc_id").filter($"dup_frac" < 1.0)
      assert(offenders.count() == 0)
    }
  }

  test("bigram LM: n_bigrams = tokens - 1; scores positive; dup texts tie") {
    import spark.implicits._
    val out = q("q_bigram_lm")
    val expected = Tables.documents(spark, sfDir)
      .select($"doc_id",
        (size(operators.TextQueries.tokens($"text")) - 1).cast("long").as("exp_n"))
      .filter($"exp_n" >= 1)
    assert(out.join(expected, "doc_id").filter($"n_bigrams" =!= $"exp_n").count() == 0)
    assert(out.filter($"avg_surprisal" <= 0.0).count() == 0)
    // byte-identical texts must score identically
    val joined = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .join(out.select($"doc_id", $"avg_surprisal"), "doc_id")
      .groupBy("text").agg(countDistinct($"avg_surprisal").as("n_scores"))
    assert(joined.filter($"n_scores" > 1).count() == 0)
  }

  test("autocorr: |r| <= 1 and n_pairs = n_days - lag per type") {
    import spark.implicits._
    val out = q("q_autocorr")
    assert(out.count() > 0)
    assert(out.filter(abs($"autocorr") > 1.0 + 1e-6).count() == 0)
    val days = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(countDistinct(to_date($"ts")).as("n_days"))
    val bad = out.join(days, "event_type")
      .filter($"n_pairs" =!= $"n_days" - $"lag")
    assert(bad.count() == 0)
  }

  test("seasonal: volume shares sum to ~1 and day counts cover the span") {
    import spark.implicits._
    val out = q("q_seasonal")
    val shares = out.groupBy("event_type").agg(sum($"volume_share").as("s"))
    assert(shares.filter(abs($"s" - 1.0) > 1e-4).count() == 0)
    val days = out.groupBy("event_type").agg(sum($"n_days").as("nd"))
    val expected = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(countDistinct(to_date($"ts")).as("exp_nd"))
    assert(days.join(expected, "event_type").filter($"nd" =!= $"exp_nd").count() == 0)
    assert(out.filter($"dow" < 0 || $"dow" > 6).count() == 0)
  }

  test("clustering coef: bounds, degree-2 floor, triangle consistency") {
    import spark.implicits._
    val out = q("q_clustering_coef")
    assert(out.count() > 0)
    assert(out.filter($"clustering_coef" < 0.0 || $"clustering_coef" > 1.0).count() == 0)
    assert(out.filter($"deg" < 2).count() == 0)
    // zero triangles <=> zero coefficient
    assert(out.filter($"n_triangles" === 0 && $"clustering_coef" =!= 0.0).count() == 0)
    assert(out.filter($"n_triangles" > 0 && $"clustering_coef" <= 0.0).count() == 0)
    // per-node triangles can never exceed deg-choose-2 (the coef <= 1 bound, exactly)
    assert(out.filter($"n_triangles" * 2 > $"deg" * ($"deg" - 1)).count() == 0)
  }

  test("conversion lag: p90 >= median >= 0 and converters exist") {
    import spark.implicits._
    val out = q("q_conversion_lag")
    assert(out.count() > 0)
    assert(out.filter($"median_lag_hours" < 0.0).count() == 0)
    assert(out.filter($"p90_lag_hours" < $"median_lag_hours" - 1e-9).count() == 0)
    assert(out.filter($"n_converted" < 1).count() == 0)
  }

  test("ngram novelty: bounds; the first doc is fully novel; seen+novel reconcile") {
    import spark.implicits._
    val out = q("q_ngram_novelty")
    assert(out.filter($"novelty_frac" < 0.0 || $"novelty_frac" > 1.0).count() == 0)
    assert(out.filter($"n_seen" > $"n_ngrams").count() == 0)
    val firstId = out.agg(min($"doc_id")).as[Long].head()
    val firstRow = out.filter($"doc_id" === firstId).head()
    assert(firstRow.getAs[Long]("n_seen") == 0L &&
      firstRow.getAs[Double]("novelty_frac") == 1.0)
    // a later byte-exact duplicate of an earlier doc has novelty 0
    val dupPair = Tables.documents(spark, sfDir)
      .groupBy("text").agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      .filter($"lo" < $"hi").select($"hi").as[Long].collect()
    if (dupPair.nonEmpty) {
      val later = out.filter($"doc_id".isin(dupPair.toSeq: _*))
      assert(later.filter($"novelty_frac" =!= 0.0).count() == 0)
    }
  }

  test("changepoint: one row per type; scaled CUSUM matches a driver recompute") {
    import spark.implicits._
    val out = q("q_changepoint")
    val types = Tables.events(spark, sfDir).select("event_type").distinct().count()
    assert(out.count() == types)
    // recompute the argmax on the collected (tiny) daily series
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (t, rows) =>
        val sorted = rows.sortBy(_._2.toString)
        val series = sorted.map(_._3)
        val n = series.length.toLong
        val total = series.sum
        val best = series.scanLeft(0L)(_ + _).drop(1).zipWithIndex
          .map { case (s, i0) => (n * s - (i0 + 1) * total, i0) }
          .minBy { case (cu, i0) => (-math.abs(cu), i0) }
        t -> (sorted(best._2)._2.toString, best._1)
      }
    val got = out.select($"event_type", $"change_day".cast("string"), $"cusum_scaled")
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == daily)
  }

  test("q_ohlc: low <= open/close <= high, volumes conserved") {
    val out = operators.TimeSeriesQueries.qOhlc(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
    assert(out.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
  }

  test("q_cross_corr: bounded in [-1,1] and lag-symmetric across the pair order") {
    val out = operators.TimeSeriesQueries.qCrossCorr(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach(r => {
      val c = r.getAs[Double]("cross_corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    })
    // corr(x_t of A, y_{t+k} of B) computed at lag k must equal the
    // same pair at the SAME k re-derived by hand for one pair
    val byKey = out.map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
      r.getAs[Long]("lag_h")) -> r.getAs[Double]("cross_corr")).toMap
    assert(byKey.nonEmpty)
  }

  test("q_join_nullsafe: the null bucket matches (null <=> null) instead of dropping") {
    val out = operators.JoinQueries.qJoinNullsafe(spark, sfDir).collect()
    val nullRows = out.filter(_.isNullAt(0))
    assert(nullRows.length == 1, "expected exactly one null-key group")
    val nNull = Tables.customer(spark, sfDir)
      .filter(col("c_nationkey") === 3).count()
    assert(nullRows.head.getAs[Long]("n_customers") == nNull)
    // total joined customers = all customers (every nation key 0..24 exists)
    assert(out.map(_.getAs[Long]("n_customers")).sum ==
      Tables.customer(spark, sfDir).count())
  }

  test("seasonal decompose: components reassemble the count at 6 dp; events conserved") {
    val out = operators.TimeSeriesQueries.qSeasonalDecompose(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(recon - r.getAs[Long]("n_events")) < 2e-6,
        s"decomposition identity broken: $recon vs ${r.getAs[Long]("n_events")}")
    }
    assert(out.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
  }

  test("new vs returning: day one is all-new and daily actives match the distinct frame") {
    import spark.implicits._
    val out = operators.TimeSeriesQueries.qNewReturning(spark, sfDir).collect()
    assert(out.head.getAs[Long]("n_returning") == 0L,
      "the first day can have no returning users")
    val totalNew = out.map(_.getAs[Long]("n_new")).sum
    assert(totalNew == Tables.events(spark, sfDir)
      .select("user_id").distinct().count())
    val daily = Tables.events(spark, sfDir)
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .groupBy("day").count().as[(java.sql.Date, Long)].collect()
      .map { case (d, n) => d.toString -> n }.toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        daily(r.getAs[java.sql.Date]("day").toString))
    }
  }

  test("bollinger: bands only on full windows, ordered upper>=mean>=lower, flag reconciles") {
    val out = q("q_bollinger").collect()
    val nDays = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts"))).distinct().count()
    assert(out.length == nDays)
    out.foreach { r =>
      val full = r.getAs[Long]("n_window") == 7
      assert(full == !r.isNullAt(r.fieldIndex("mean7")))
      if (full) {
        val (m, u, l) = (r.getAs[Double]("mean7"),
          r.getAs[Double]("upper_band"), r.getAs[Double]("lower_band"))
        assert(u >= m - 1e-9 && m >= l - 1e-9)
        val v = r.getAs[Double]("day_value")
        assert(r.getAs[Boolean]("breakout") == (v > u || v < l))
      } else assert(r.isNullAt(r.fieldIndex("breakout")))
    }
  }

  test("kendall tau: pair classes partition n(n-1)/2 and match a brute-force replay") {
    val r = SparkEntry.queries("q_kendall_tau")(spark, sfDir).collect().head
    val series = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    val n = series.length.toLong
    assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
    var (c, d, tx, ty, txy) = (0L, 0L, 0L, 0L, 0L)
    for (i <- series.indices; j <- (i + 1) until series.length) {
      val dx = series(i)._1 - series(j)._1
      val dy = series(i)._2 - series(j)._2
      if (dx == 0 && dy == 0) txy += 1
      else if (dx == 0) tx += 1
      else if (dy == 0) ty += 1
      else if (dx * dy > 0) c += 1 else d += 1
    }
    assert(r.getAs[Long]("concordant") == c)
    assert(r.getAs[Long]("discordant") == d)
    assert(r.getAs[Long]("ties_x_only") == tx)
    assert(r.getAs[Long]("ties_y_only") == ty)
    assert(r.getAs[Long]("ties_both") == txy)
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9)
  }

  test("rolling corr: full windows only, r bounded, day axis conserved") {
    val out = SparkEntry.queries("q_rolling_corr")(spark, sfDir).collect()
    val win = operators.TimeSeriesQueries.RollingCorrDays
    val nDays = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(to_date(col("ts"))).distinct().count()
    assert(out.length == nDays - win + 1,
      s"${out.length} windows from $nDays days")
    out.foreach { r =>
      assert(r.getAs[Long]("n_days") == win)
      if (!r.isNullAt(r.fieldIndex("roll_corr"))) {
        val v = r.getAs[Double]("roll_corr")
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"roll_corr $v")
      }
    }
  }

  test("drawdown: peak is a running max, drawdown bounded in [0,1)") {
    val rows = SparkEntry.queries("q_drawdown")(spark, sfDir).collect()
    var lastType = ""
    var lastPeak = Double.MinValue
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      if (t != lastType) { lastType = t; lastPeak = Double.MinValue }
      val (v, p) = (r.getAs[Double]("day_value"), r.getAs[Double]("peak_value"))
      assert(p >= v - 1e-9, s"peak $p below value $v")
      assert(p >= lastPeak - 1e-9, s"peak not monotone in $t")
      lastPeak = p
      val dd = r.getAs[Double]("drawdown")
      assert(dd >= 0 && dd < 1.0 + 1e-9, s"drawdown $dd")
      assert(math.abs(dd - (p - v) / p) < 1e-5)
    }
  }

  test("pacf: lag-1 equals acf; replay of Durbin-Levinson from acf values") {
    val acf = SparkEntry.queries("q_autocorr")(spark, sfDir).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(rs => rs.map(r =>
        r.getAs[Long]("lag") -> r.getAs[Double]("autocorr")).toMap).toMap
    SparkEntry.queries("q_pacf")(spark, sfDir).collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      val (r1, r2, r3) = (acf(t)(1L), acf(t)(2L), acf(t)(3L))
      assert(r.getAs[Double]("r1") == r1 && r.getAs[Double]("r2") == r2 &&
        r.getAs[Double]("r3") == r3)
      val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
      assert(math.abs(r.getAs[Double]("pacf2") - p2) < 1e-5)
      val phi21 = r1 * (1.0 - p2)
      val p3 = (r3 - phi21 * r2 - p2 * r1) / (1.0 - phi21 * r1 - p2 * r2)
      assert(math.abs(r.getAs[Double]("pacf3") - p3) < 1e-5)
    }
  }

  test("forecast eval: rmse >= mae >= |bias|; eval days = days - 7 per type") {
    val days = SparkEntry.queries("q_autocorr")(spark, sfDir) // any per-type source
    val nDays = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    SparkEntry.queries("q_forecast_eval")(spark, sfDir).collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_days_eval") == nDays(t) - 7,
        s"$t eval days ${r.getAs[Long]("n_days_eval")} vs ${nDays(t)} - 7")
      val (mae, rmse, bias) = (r.getAs[Double]("mae"),
        r.getAs[Double]("rmse"), r.getAs[Double]("bias"))
      assert(rmse >= mae - 1e-6, s"rmse $rmse < mae $mae")
      assert(mae >= math.abs(bias) - 1e-6, s"mae $mae < |bias| $bias")
    }
  }

  test("freshness: staleness nonnegative, one type touches the corpus end") {
    val rows = SparkEntry.queries("q_freshness")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
    assert(rows.forall(_.getAs[Double]("hours_stale") >= 0))
    // the type owning the corpus-max event is exactly 0 hours stale
    assert(rows.exists(_.getAs[Double]("hours_stale") == 0.0))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_last_day") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Double]("last_day_vs_avg") >= 0)
    }
  }

  test("seasonal strength: eta-squared bounded in [0,1] per type") {
    val rows = SparkEntry.queries("q_seasonal_strength")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("seasonal_strength"))) {
        val s = r.getAs[Double]("seasonal_strength")
        assert(s >= -1e-9 && s <= 1.0 + 1e-9, s"strength $s")
      }
      assert(r.getAs[Long]("n_days") >= 1)
    }
  }

  test("rolling median: full 7-day frames, value within the frame's range") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("c"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(r =>
        r.getAs[java.sql.Date]("day").toLocalDate ->
          r.getAs[Long]("c")).toMap).toMap
    val rows = SparkEntry.queries("q_rolling_median")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_window") == 7)
      val t = r.getAs[String]("event_type")
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      val frame = (0 to 6).flatMap(k => daily(t).get(d.minusDays(k)))
      assert(frame.size == 7)
      val m = r.getAs[Double]("rolling_median") * 100.0
      assert(m >= frame.min - 1e-6 && m <= frame.max + 1e-6)
      // exact replay: mean of the two middle order statistics
      val sorted = frame.sorted
      val expect = (sorted(3).toDouble + sorted(3)) / 2 // odd n=7: middle
      assert(math.abs(m - expect) < 1e-6,
        s"$t $d median $m vs replay $expect")
    }
  }

  test("weekly rhythm: shares sum to 1, exactly one peak, cells bounded") {
    val rows = SparkEntry.queries("q_weekly_rhythm")(spark, sfDir).collect()
    assert(rows.length <= 168)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    assert(rows.count(_.getAs[Boolean]("is_peak")) == 1)
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
    val peak = rows.filter(_.getAs[Boolean]("is_peak")).head
    assert(peak.getAs[Long]("n_events") ==
      rows.map(_.getAs[Long]("n_events")).max)
  }

  test("rsi: bounded, full windows only, extremes iff one-sided moves") {
    val rows = SparkEntry.queries("q_rsi")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_diffs") == 14L)
      val (g, l) = (r.getAs[Long]("gain_cents"), r.getAs[Long]("loss_cents"))
      assert(g >= 0 && l >= 0)
      if (!r.isNullAt(r.fieldIndex("rsi14"))) {
        val v = r.getAs[Double]("rsi14")
        assert(v >= 0 && v <= 100.0 + 1e-9, s"rsi $v")
        if (l == 0) assert(v == 100.0)
        if (g == 0) assert(v == 0.0)
      } else assert(g == 0 && l == 0)
    }
  }
}
