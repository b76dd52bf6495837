package graft

import graft.operators.{AdvancedTextQueries, TextQueries, ValidationQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the corpus-governance operators: the dedup
  * representative really is the best member of its cluster, the split
  * really partitions the corpus, and the DQ report really notices an
  * injected violation.
  */
class ValidationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q_dedup_keep_best: clusters partition the corpus and keep the max-quality member") {
    val rep = AdvancedTextQueries.qDedupKeepBest(spark, sfDir).cache()
    val nDocs = Tables.documents(spark, sfDir).count()
    // every document is in exactly one cluster
    assert(rep.agg(sum("cluster_size")).head().getLong(0) == nDocs)
    assert(rep.select("component").distinct().count() == rep.count())
    // dropped is always cluster_size - 1 and the corpus shrank
    assert(rep.filter(col("dropped") =!= col("cluster_size") - 1).count() == 0)
    assert(rep.count() < nDocs, "expected at least one non-trivial cluster")
    // the kept member's quality is the cluster max: re-derive each
    // doc's component from the cluster table and compare per-component
    // maxima
    val comp = AdvancedTextQueries.qDedupClusters(spark, sfDir)
    val quality = Tables.documents(spark, sfDir).select(col("doc_id"),
      AdvancedTextQueries.qualityScore(col("text")).as("q"))
    val best = quality.join(comp, col("doc_id") === col("id"), "left")
      .select(coalesce(col("component"), col("doc_id")).as("component"), col("q"))
      .groupBy("component").agg(max("q").as("max_q"))
    val bad = rep.join(best, Seq("component"))
      .filter(col("keep_quality") =!= col("max_q")).count()
    assert(bad == 0, s"$bad clusters keep a non-maximal member")
    rep.unpersist()
  }

  test("q_split_train: deterministic, disjoint, ~80/10/10") {
    val s1 = TextQueries.qSplitTrain(spark, sfDir).collect()
    val s2 = TextQueries.qSplitTrain(spark, sfDir).collect()
    assert(s1.sameElements(s2), "split assignment must be retry-stable")
    val total = s1.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sfDir).count(),
      "splits must cover every document exactly once")
    val byi = s1.groupBy(_.getAs[String]("split"))
      .map { case (k, rows) => k -> rows.map(_.getAs[Long]("n_docs")).sum }
    val trainFrac = byi("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac off 0.8")
    assert(byi.keySet == Set("train", "val", "test"))
  }

  test("ewma: constant series reproduces the constant; weights renormalize at series start") {
    import spark.implicits._
    val const = (1 to 20)
      .map(i => (1L, i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00"), 7.5))
      .toDF("user_id", "event_id", "ts", "value")
    val out = operators.EventQueries.ewmaFrom(const).collect()
    assert(out.length == 20)
    // renormalized weights make EVERY row's smoothing of a constant the
    // constant itself — including the first rows with missing lags
    assert(out.forall(_.getAs[Double]("ewma") == 7.5))
    // a step series: ewma lags behind the step but stays within range
    val step = (1 to 20)
      .map(i => (1L, i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00"),
        if (i <= 10) 0.0 else 10.0))
      .toDF("user_id", "event_id", "ts", "value")
    val s = operators.EventQueries.ewmaFrom(step).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma")).toMap
    assert(s(10) == 0.0 && s(11) > 2.9 && s(11) < 10.0 && s(20) > s(11))
  }

  test("embed centroid: long-format mean matches a brute-force recompute") {
    val cents = operators.SimilarityQueries.qEmbedCentroid(spark, sfDir)
      .filter(col("dim") === 1).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Double]("centroid")).toMap
    val brute = Tables.embeddings(spark, sfDir)
      .select(col("label"), element_at(col("embedding"), 1).cast("double").as("v"))
      .collect().groupBy(_.getAs[Int]("label"))
      .map { case (l, rows) =>
        val qs = rows.map(r => math.round(r.getAs[Double]("v") * 1000000))
        l -> (math.round(qs.sum.toDouble / (qs.length * 1000000.0) * 1e6) / 1e6)
      }
    assert(cents.keySet == brute.keySet)
    for ((l, c) <- brute)
      assert(math.abs(cents(l) - c) < 1e-9, s"label $l: ${cents(l)} vs $c")
  }

  test("skyline sort-scan equals the quadratic dominance anti-join") {
    val scan = operators.AnalyticsQueries.qSkyline(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    val pts = Tables.part(spark, sfDir)
      .select(col("p_brand"), col("p_size"), col("p_retailprice")).distinct()
    val dominated = pts.as("a").join(pts.as("b"),
      col("b.p_brand") === col("a.p_brand") &&
        col("b.p_size") >= col("a.p_size") &&
        col("b.p_retailprice") <= col("a.p_retailprice") &&
        (col("b.p_size") > col("a.p_size") ||
          col("b.p_retailprice") < col("a.p_retailprice")),
      "left_semi")
    val brute = pts.exceptAll(dominated).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(scan == brute)
    assert(scan.nonEmpty && scan.size < pts.count(),
      "degenerate skyline: nothing dominated")
  }

  test("reservoir sample: exactly min(k, n) rows per stratum, retry-stable") {
    val s1 = operators.AnalyticsQueries.qSampleReservoir(spark, sfDir).collect()
    val s2 = operators.AnalyticsQueries.qSampleReservoir(spark, sfDir).collect()
    assert(s1.sameElements(s2))
    val perLang = s1.groupBy(_.getString(0)).map { case (l, r) => l -> r.length }
    val counts = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == counts.map { case (l, n) => l -> math.min(10L, n).toInt })
  }

  test("attribution: clicks precede their purchases; gaps match; unattributed stay null") {
    val rows = operators.BehaviorQueries.qAttribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val attributed = rows.filter(!_.isNullAt(3))
    assert(attributed.nonEmpty, "degenerate: no purchase has a preceding click")
    assert(attributed.forall(r => r.getLong(3) <= r.getLong(2)),
      "an attributed click must not postdate its purchase")
    assert(attributed.forall(r => r.getLong(4) == r.getLong(2) - r.getLong(3)))
    assert(rows.filter(_.isNullAt(3)).forall(_.isNullAt(4)),
      "no click → no gap")
  }

  test("vocab coverage: ranks dense, shares monotone, full vocab covers 100%") {
    val v = operators.TextQueries.qVocabCoverage(spark, sfDir).collect()
    assert(v.map(_.getInt(0)).toSeq == (1 to v.length))
    val shares = v.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    // the synthetic corpus vocabulary is smaller than the 500 cap, so
    // the last row must cover everything
    assert(v.length < 500 && shares.last == 1.0)
  }

  test("containment flags a doc-in-doc inclusion that Jaccard misses") {
    import spark.implicits._
    val small = (1 to 12).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val big = small + " " + (1 to 300).map(i => s"filler$i pad$i word$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val cont = operators.AdvancedTextQueries.containmentPairs(docs, 1000)
      .collect()
    assert(cont.length == 1 && cont.head.getDouble(2) >= 0.9,
      s"inclusion not detected: ${cont.mkString}")
    val jac = operators.AdvancedTextQueries.ngramJaccardPairs(docs, 1000)
      .collect()
    assert(jac.isEmpty, "Jaccard should miss the size-skewed inclusion")
  }

  test("q_dq_report: all green on the clean table, flips on injected violations") {
    val orders = Tables.orders(spark, sfDir)
    val clean = ValidationQueries.reportFrom(orders)
    assert(clean.filter(!col("passed")).count() == 0, "clean table must pass all checks")
    assert(clean.count() == 5)
    // duplicate an order AND null out its custkey: exactly the
    // uniqueness and completeness checks must flip, the rest stay green
    val dup = orders.limit(1)
      .withColumn("o_custkey", lit(null).cast("long"))
    val dirty = ValidationQueries.reportFrom(orders.unionByName(dup))
    val failed = dirty.filter(!col("passed"))
      .select("check_name").collect().map(_.getString(0)).toSet
    assert(failed == Set("orderkey_unique", "custkey_complete"),
      s"unexpected verdicts: $failed")
  }

  test("q_quality_gate: funnel monotone, drops reconcile, dedup stage matches canonical") {
    import spark.implicits._
    val out = SparkEntry.queries("q_quality_gate")(spark, sfDir).cache()
    assert(out.count() == 5)
    val rows = out.orderBy($"stage_id").collect()
    // stage 0 counts the corpus; survivors never increase
    assert(rows(0).getLong(2) ==
      Tables.documents(spark, sfDir).count())
    val passes = rows.map(_.getLong(2))
    assert(passes.zip(passes.tail).forall { case (a, b) => b <= a })
    // dropped at stage i equals the survivor difference from stage i-1
    rows.tail.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(3) == passes(i) - r.getLong(2))
    }
    out.unpersist()
  }

  test("q_kanon: cells cover all customers; risky members below k") {
    import spark.implicits._
    val out = SparkEntry.queries("q_kanon")(spark, sfDir).cache()
    assert(out.agg(sum($"n_customers")).as[Long].head() ==
      Tables.customer(spark, sfDir).count())
    // exposed <= risky_cells * (k-1): each risky cell holds < 5 members
    assert(out.filter($"n_exposed" > $"n_risky_cells" * 4 ||
      $"n_risky_cells" > $"n_cells").count() == 0)
    out.unpersist()
  }

  test("q_ldiversity: covers exactly the ordering customers; l bounds respected") {
    import spark.implicits._
    val out = SparkEntry.queries("q_ldiversity")(spark, sfDir).cache()
    // the audit covers every customer WITH orders, each once (inner
    // join contract: no orders -> no sensitive value -> not audited)
    val ordering = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    assert(out.agg(sum($"n_customers")).as[Long].head() == ordering)
    // l is between 1 and the 5 distinct order priorities; a cell below
    // the l=3 bar is counted in both cell and member exposure
    assert(out.filter($"min_l" < 1 || $"min_l" > 5).count() == 0)
    assert(out.filter($"n_low_div_cells" > $"n_cells" ||
      $"n_exposed" > $"n_customers").count() == 0)
    // cross-check one segment naively
    val seg = out.orderBy("c_mktsegment").head()
    val naive = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === seg.getString(0))
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .groupBy($"c_nationkey", floor($"c_acctbal" / 1000.0).as("b"))
      .agg(countDistinct($"o_orderpriority").as("l"))
    assert(naive.count() == seg.getAs[Long]("n_cells"))
    assert(naive.filter($"l" < 3).count() == seg.getAs[Long]("n_low_div_cells"))
    out.unpersist()
  }

  test("q_decayed_sum: bounded by raw spend, anchored week is undecayed") {
    import spark.implicits._
    val out = SparkEntry.queries("q_decayed_sum")(spark, sfDir).cache()
    val raw = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .groupBy("user_id")
      .agg(sum(round($"value" * 100).cast("long")).as("raw_cents"),
        count(lit(1)).as("n_raw"))
    // decay never increases spend, and counts match the raw purchases
    val bad = out.join(raw, "user_id")
      .filter($"decayed_micro_cents" > $"raw_cents" * 1000000L ||
        $"n_purchases" =!= $"n_raw")
      .count()
    assert(bad == 0)
    assert(out.count() == raw.count())
    out.unpersist()
  }

  test("q_cluster_sizes: histogram accounts for every document exactly once") {
    import spark.implicits._
    val out = SparkEntry.queries("q_cluster_sizes")(spark, sfDir).cache()
    // sum(size * n_clusters) == corpus size (every doc in exactly one
    // cluster or the singleton bucket)
    val covered = out.agg(sum($"cluster_size" * $"n_clusters")).as[Long].head()
    assert(covered == Tables.documents(spark, sfDir).count())
    // non-singleton buckets must agree with the CC labels directly
    val cc = SparkEntry.queries("q_dedup_clusters")(spark, sfDir)
    val fromCc = cc.groupBy("component").agg(count(lit(1)).as("s"))
      .groupBy("s").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nonSingleton = out.filter($"cluster_size" > 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nonSingleton == fromCc)
    out.unpersist()
  }

  test("q_profile: key column fully distinct on clean orders; exact on planted nulls") {
    import spark.implicits._
    val out = SparkEntry.queries("q_profile")(spark, sfDir).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("completeness"))).toMap
    val n = Tables.orders(spark, sfDir).count()
    assert(out("o_orderkey") == ((0L, n, 1.0)))
    assert(out.size == 6 && out.values.forall(_._1 == 0L))
    // toy with planted nulls and duplicates: counts are closed-form
    val toy = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "a"), (3L, null), (null, "b")).toDF("k", "v")
    val p = ValidationQueries.profile(toy, Seq("k", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(p("k") == ((1L, 3L, 0.75)))
    assert(p("v") == ((1L, 2L, 0.75)))
  }
}
