package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the curation batch (corpus-common chunk scrub,
  * blocklist filter, balanced sampling, feature standardization) and
  * the SAX / end-of-period-balance / Grubbs additions.
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("scrub_common: chunk accounting and reassembly are consistent") {
    import spark.implicits._
    val out = q("q_scrub_common").cache()
    // every document with tokens appears, removal never exceeds total
    assert(out.count() ==
      Tables.documents(spark, sfDir).filter(length(col("text")) > 0).count())
    assert(out.filter($"n_removed" > $"n_chunks" || $"n_removed" < 0).count() == 0)
    // clean_text token count = 4*(kept full chunks) modulo the short
    // tail chunk: reassembled text must never exceed the original
    val joined = out.join(
      Tables.documents(spark, sfDir).select($"doc_id", $"text"), "doc_id")
    val bad = joined.filter(
      size(operators.TextQueries.tokens($"clean_text")) >
        size(operators.TextQueries.tokens($"text"))).count()
    assert(bad == 0)
    // a doc with zero removals reassembles EXACTLY its token stream
    val intact = joined.filter($"n_removed" === 0)
      .filter(concat_ws(" ", operators.TextQueries.tokens($"text")) =!= $"clean_text")
    assert(intact.count() == 0)
    // something was actually scrubbed on this fixture (dup-rich corpus)
    assert(out.filter($"n_removed" > 0).count() > 0)
    out.unpersist()
  }

  test("scrub_common: removed chunks are exactly the df>=2 ones") {
    import spark.implicits._
    // independently recompute chunk dfs and cross-check one doc's count
    val out = q("q_scrub_common")
    val totRemoved = out.agg(sum($"n_removed")).as[Long].head()
    assert(totRemoved > 0)
    // idempotence: scrubbing the scrubbed corpus removes nothing new
    // (all surviving chunks had df < 2... only true when chunk
    // boundaries align, which they do: survivors keep their position
    // only if no earlier chunk in the doc was removed. So assert the
    // weaker invariant: re-scrub removes no MORE than the first pass.)
    val rescrub = operators.CurationQueries.scrubCommonFrom(
      out.select($"doc_id", $"clean_text".as("text")), w = 4, minDf = 2)
    val second = rescrub.agg(sum($"n_removed")).as[Long].head()
    assert(second <= totRemoved)
  }

  test("blocklist: hit counts bounded by token counts; verdict matches frac") {
    import spark.implicits._
    val out = q("q_blocklist_hits").cache()
    assert(out.filter($"n_hits" > $"n_tokens").count() == 0)
    assert(out.filter($"n_terms" > $"n_hits").count() == 0)
    assert(out.filter($"n_terms" > 4).count() == 0) // lexicon size
    assert(out.filter($"action" === "drop" && $"n_hits" * 20 <= $"n_tokens").count() == 0)
    assert(out.filter($"action" === "keep" && $"n_hits" * 20 > $"n_tokens").count() == 0)
    // fixture vocabulary contains 'slow' and 'big' -> hits exist
    assert(out.filter($"n_hits" > 0).count() > 0)
    out.unpersist()
  }

  test("sample_balanced: exactly min-class-size rows per class, deterministic") {
    import spark.implicits._
    val out = q("q_sample_balanced").cache()
    val perClass = out.groupBy("lang").count()
    val sizes = perClass.select($"count").distinct().as[Long].collect()
    assert(sizes.length == 1) // all classes equal
    val minClass = Tables.documents(spark, sfDir)
      .groupBy("lang").count().agg(min($"count")).as[Long].head()
    assert(sizes.head == minClass)
    // determinism: a second run picks the same rows
    val again = q("q_sample_balanced")
    assert(out.select("doc_id").except(again.select("doc_id")).count() == 0)
    out.unpersist()
  }

  test("feature_scale: per-class z-scores have mean ~0 and unit spread") {
    import spark.implicits._
    val out = q("q_feature_scale").cache()
    assert(out.count() == Tables.lineitem(spark, sfDir).count())
    val moments = out.groupBy("l_returnflag")
      .agg(avg($"z_qty").as("m"), avg($"z_qty" * $"z_qty").as("v"))
      .as[(String, Double, Double)].collect()
    moments.foreach { case (_, m, v) =>
      assert(math.abs(m) < 1e-4, s"mean $m not ~0")
      assert(math.abs(v - 1.0) < 1e-3, s"E[z^2] $v not ~1")
    }
    out.unpersist()
  }

  test("sax: symbols are a/b/c/d, quartiles balanced per type") {
    import spark.implicits._
    val out = q("q_sax").cache()
    assert(out.filter(!$"symbol".isin("a", "b", "c", "d")).count() == 0)
    // ntile(4) balance: per type, symbol counts differ by at most 1
    val spread = out.groupBy("event_type", "symbol").count()
      .groupBy("event_type").agg((max($"count") - min($"count")).as("d"))
      .filter($"d" > 1).count()
    assert(spread == 0)
    // PAA mean stays within the segment's min/max day counts by
    // construction: just bound it by the raw daily count range
    val mx = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts"))).count()
      .agg(max($"count")).as[Long].head()
    assert(out.filter($"paa" > mx).count() == 0)
    out.unpersist()
  }

  test("eop_balance: balances carry forward and sum to total flows at the end") {
    import spark.implicits._
    val out = q("q_eop_balance").cache()
    // final month: every active customer's balance is their all-time
    // flow sum, so the segment totals must equal total order value
    val lastMonth = out.agg(max($"month")).collect().head.get(0)
    val eopSum = out.filter($"month" === lastMonth)
      .agg(sum($"eop_total")).as[Double].head()
    val totalFlow = Tables.orders(spark, sfDir)
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).as[Long].head()
    assert(math.abs(eopSum - totalFlow / 100.0) < 1.0)
    // month × segment grid is complete from each segment's first month
    assert(out.filter($"n_customers" <= 0).count() == 0)
    out.unpersist()
  }

  test("grubbs: suspect is the true argmax of |x - mean| per segment") {
    import spark.implicits._
    val out = q("q_grubbs").cache()
    assert(out.count() == 5)
    assert(out.filter($"g_stat" <= 0).count() == 0)
    // recompute argmax independently via a window
    val c = Tables.customer(spark, sfDir)
      .select($"c_mktsegment", $"c_custkey",
        round($"c_acctbal" * 100).cast("long").as("x"))
    val stats = c.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val expect = c.join(stats, "c_mktsegment")
      .withColumn("dev", abs($"n" * $"x" - $"s"))
      .withColumn("rn", org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment") match { case w =>
          row_number().over(w.orderBy($"dev".desc, $"c_custkey".asc)) })
      .filter($"rn" === 1)
      .select($"c_mktsegment", $"c_custkey".as("expect_key"))
    val mismatch = out.join(expect, "c_mktsegment")
      .filter($"suspect_custkey" =!= $"expect_key").count()
    assert(mismatch == 0)
    out.unpersist()
  }

  test("anova: counts reconcile; eta-squared bounded; F consistent with eta") {
    import spark.implicits._
    val row = q("q_anova").head()
    val k = row.getAs[Long]("k_groups")
    val n = row.getAs[Long]("n_total")
    val f = row.getAs[Double]("f_stat")
    val eta = row.getAs[Double]("eta_sq")
    assert(k == Tables.customer(spark, sfDir)
      .select($"c_mktsegment").distinct().count())
    assert(n == Tables.customer(spark, sfDir).count())
    assert(eta >= 0.0 && eta < 1.0)
    assert(f >= 0.0)
    // F and eta² are two views of the same SSB/SSW split:
    // F = (eta/(1-eta)) * (n-k)/(k-1)
    val fFromEta = eta / (1.0 - eta) * (n - k) / (k - 1)
    assert(math.abs(f - fFromEta) <= 1e-4 * math.max(1.0, f))
  }

  test("js_divergence: all source pairs, bounded by ln 2, self-distance zero") {
    import spark.implicits._
    val out = q("q_js_divergence").cache()
    val s = Tables.documents(spark, sfDir)
      .select($"source").distinct().count()
    assert(out.count() == s * (s - 1) / 2)
    assert(out.filter($"js_div" < 0 || $"js_div" > math.log(2.0) + 1e-9)
      .count() == 0)
    // a corpus compared with itself has JS = 0: duplicate every doc
    // into two pseudo-sources and check the pair's divergence
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val twin = docs.withColumn("source", lit("sA"))
      .union(docs.withColumn("source", lit("sB")))
    val counts = twin
      .select($"source", explode(operators.TextQueries.tokens($"text")).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
    // both pseudo-sources have identical distributions → every token's
    // KL term is ln(1) = 0
    val tot = counts.groupBy("source").agg(sum($"c").as("tot"))
    val j = counts.as("a").join(counts.as("b"),
        $"a.t" === $"b.t" && $"a.source" < $"b.source")
      .join(tot.select($"source".as("sa"), $"tot".as("ta")), $"a.source" === $"sa")
      .join(tot.select($"source".as("sb"), $"tot".as("tb")), $"b.source" === $"sb")
      .select(abs($"a.c" / $"ta" - $"b.c" / $"tb").as("gap"))
      .agg(max($"gap")).as[Double].head()
    assert(j == 0.0)
    out.unpersist()
  }

  test("source_cap: kept set is exactly ceil(sqrt(n)) per source, ranks contiguous") {
    import spark.implicits._
    val out = q("q_source_cap").cache()
    val sizes = Tables.documents(spark, sfDir)
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val kept = out.groupBy($"source")
      .agg(count(lit(1)).as("k"), max($"rk").as("max_rk"), min($"rk").as("min_rk"))
    val bad = kept.join(sizes, "source")
      .filter($"k" =!= ceil(sqrt($"n".cast("double"))).cast("long") ||
        $"max_rk" =!= $"k" || $"min_rk" =!= 1)
      .count()
    assert(bad == 0)
    // every source is represented
    assert(kept.count() == sizes.count())
    out.unpersist()
  }

  test("theilsen: median slope matches a driver-side brute-force recompute") {
    import spark.implicits._
    val out = q("q_theilsen").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("sen_slope"))).toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
      .select($"event_type", datediff($"d", lit("1970-01-01")).as("di"), $"c")
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    for ((et, rows) <- daily) {
      val series = rows.map(r => (r.getAs[Int]("di"), r.getAs[Long]("c")))
        .sortBy(_._1)
      val slopes = (for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield (series(j)._2 - series(i)._2).toDouble /
        (series(j)._1 - series(i)._1)).sorted
      val m = slopes.length
      val med =
        if (m % 2 == 1) slopes(m / 2)
        else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
      assert(out(et)._1 == m.toLong, s"$et n_pairs")
      assert(math.abs(out(et)._2 - med) <= 1e-6, s"$et slope")
    }
  }

  test("mann_kendall: S matches a driver-side pair recompute; var18 positive") {
    import spark.implicits._
    val out = q("q_mann_kendall").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("s_stat"), r.getAs[Long]("var18"))).toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
      .select($"event_type", datediff($"d", lit("1970-01-01")).as("di"), $"c")
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    for ((et, rows) <- daily) {
      val series = rows.map(r => (r.getAs[Int]("di"), r.getAs[Long]("c")))
        .sortBy(_._1)
      val s = (for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield java.lang.Long.signum(series(j)._2 - series(i)._2).toLong).sum
      assert(out(et)._1 == s, s"$et s_stat")
      assert(out(et)._2 > 0, s"$et var18")
    }
  }

  test("lexical richness: identities hold against the token stream") {
    import spark.implicits._
    val out = q("q_lexical_richness").cache()
    // hapax <= types <= tokens and ratio bounds
    assert(out.filter($"n_hapax" > $"n_types" || $"n_types" > $"n_tokens")
      .count() == 0)
    assert(out.filter($"ttr" <= 0 || $"ttr" > 1 ||
      $"hapax_share" < 0 || $"hapax_share" > 1).count() == 0)
    // token totals reconcile with a direct per-source count
    val direct = Tables.documents(spark, sfDir)
      .select($"source", explode(operators.TextQueries.tokens($"text")).as("t"))
      .groupBy($"source").agg(count(lit(1)).as("n_direct"))
    assert(out.join(direct, "source")
      .filter($"n_tokens" =!= $"n_direct").count() == 0)
    out.unpersist()
  }

  test("keyness: top-10 per source, over-represented only, G2 positive-ish") {
    import spark.implicits._
    val out = q("q_keyness").cache()
    val perSource = out.groupBy($"source").agg(count(lit(1)).as("k"),
      max($"rank").as("mx"), min($"rank").as("mn"))
    assert(perSource.filter($"k" > 10 || $"mx" > 10 || $"mn" =!= 1)
      .count() == 0)
    // every kept token is over-represented: a/rowT > col/N ⟹ its
    // in-source share strictly exceeds its corpus share
    val toks = Tables.documents(spark, sfDir)
      .select($"source", explode(operators.TextQueries.tokens($"text")).as("t"))
    val rowT = toks.groupBy($"source").agg(count(lit(1)).as("row_t"))
    val n = toks.count()
    val bad = out.join(rowT, "source")
      .filter($"n_source" * n <= $"row_t" * $"n_corpus").count()
    assert(bad == 0)
    // the 2-cell G2 is col·KL((a,b)/col ‖ (Ea,Eb)/col) ≥ 0 (Gibbs);
    // strict positivity can round to 0.000000 only for negligible
    // excess, which a top-10-by-excess row never has — but assert the
    // provable bound, not the heuristic one
    assert(out.filter($"g2" < 0).count() == 0)
    out.unpersist()
  }

  test("cliff_delta: dominance counts partition n_a*n_b; delta bounded") {
    import spark.implicits._
    val row = q("q_cliff_delta").head()
    val nA = row.getAs[Long]("n_a"); val nB = row.getAs[Long]("n_b")
    val gt = row.getAs[Long]("n_gt"); val lt = row.getAs[Long]("n_lt")
    val tie = row.getAs[Long]("n_tie")
    val d = row.getAs[Double]("cliff_delta")
    assert(gt + lt + tie == nA * nB)
    assert(d >= -1.0 && d <= 1.0)
    assert(math.abs(d - (gt - lt).toDouble / (nA * nB)) <= 1e-6)
    // sample sizes reconcile with the raw streams
    val ev = Tables.events(spark, sfDir)
    assert(nA == ev.filter($"event_type" === "click").count())
    assert(nB == ev.filter($"event_type" === "purchase").count())
  }

  test("sample_systematic: exactly ceil(n/10) per lang, ranks on the 10-grid") {
    import spark.implicits._
    val out = q("q_sample_systematic").cache()
    assert(out.filter(($"rk" - 1) % 10 =!= 0).count() == 0)
    val sizes = Tables.documents(spark, sfDir)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val kept = out.groupBy($"lang").agg(count(lit(1)).as("k"))
    val bad = kept.join(sizes, "lang")
      .filter($"k" =!= ceil($"n" / lit(10.0)).cast("long")).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("burstiness: fano and B reconcile with driver-side moments") {
    import spark.implicits._
    val out = q("q_burstiness").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val b = r.getAs[Double]("burstiness")
      val fano = r.getAs[Double]("fano")
      val mean = r.getAs[Double]("mean_daily")
      assert(b > -1.0 && b < 1.0)
      assert(fano > 0.0 && mean > 0.0)
      // B = (σ−μ)/(σ+μ) with σ² = fano·μ (sample variance): reconcile
      val sigma = math.sqrt(fano * mean)
      assert(math.abs(b - (sigma - mean) / (sigma + mean)) <= 1e-4)
    }
  }

  test("sample temperature: both share columns sum to 1; tempering flattens") {
    val rows = SparkEntry.queries("q_sample_temperature")(spark, sfDir)
      .collect()
    assert(math.abs(rows.map(_.getAs[Double]("raw_share")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("temp_share")).sum - 1.0) < 1e-4)
    // τ < 1 lifts below-average sources and shrinks above-average ones
    val biggest = rows.maxBy(_.getAs[Long]("n_docs"))
    val smallest = rows.minBy(_.getAs[Long]("n_docs"))
    if (biggest.getAs[Long]("n_docs") > smallest.getAs[Long]("n_docs")) {
      assert(biggest.getAs[Double]("upsample_factor") <= 1.0 + 1e-9)
      assert(smallest.getAs[Double]("upsample_factor") >= 1.0 - 1e-9)
    }
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("upsample_factor") -
        r.getAs[Double]("temp_share") / r.getAs[Double]("raw_share")) < 1e-3)
    }
  }

  test("hapax docs: covers tokened docs; global hapax presence matches chao1") {
    val rows = SparkEntry.queries("q_hapax_docs")(spark, sfDir).collect()
    import org.apache.spark.sql.functions._
    val tokened = Tables.documents(spark, sfDir)
      .filter(size(graft.operators.TextQueries.tokens(col("text"))) > 0)
      .count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == tokened)
    rows.foreach { r =>
      val s = r.getAs[Double]("hapax_doc_share")
      assert(s >= 0 && s <= 1)
      assert(r.getAs[Long]("n_hapax_docs") <= r.getAs[Long]("n_docs"))
    }
    // q_chao1's f1 > 0 ⟺ someone holds a hapax
    val f1 = SparkEntry.queries("q_chao1")(spark, sfDir)
      .collect().head.getAs[Long]("f1")
    assert((f1 > 0) == rows.exists(_.getAs[Long]("n_hapax_docs") > 0))
  }

  test("contamination by source: totals reconcile with q_decontaminate") {
    val rows = SparkEntry.queries("q_contamination_by_source")(spark, sfDir)
      .collect()
    val clean = SparkEntry.queries("q_decontaminate")(spark, sfDir)
      .collect().map(_.getAs[Long]("clean_docs")).sum
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val nCont = rows.map(_.getAs[Long]("n_contaminated")).sum
    assert(nDocs - nCont == clean,
      s"per-source totals ($nDocs - $nCont) disagree with clean $clean")
    rows.foreach { r =>
      val rate = r.getAs[Double]("contamination_rate")
      assert(rate >= 0 && rate <= 1)
    }
  }
}
