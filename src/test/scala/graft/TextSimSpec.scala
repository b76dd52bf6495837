package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the LLM-pipeline operators: dedup, text stats, tfidf,
  * similarity top-k, and the UDAF surface.
  */
class TextSimSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("exact dedup: groups cover all docs; hash variant agrees") {
    import spark.implicits._
    val out = q("q_dedup_exact")
    assert(out.agg(sum($"n_dups")).as[Long].head() ==
      Tables.documents(spark, sfDir).count())
    val viaHash = operators.TextQueries.dedupExactByHash(spark, sfDir)
    assert(out.exceptAll(viaHash).count() == 0 &&
      viaHash.exceptAll(out).count() == 0)
  }

  test("canonical dedup: covers all docs; folds case/punct variants on a toy frame") {
    import spark.implicits._
    val out = q("q_dedup_canonical")
    assert(out.agg(sum($"n_dups")).as[Long].head() ==
      Tables.documents(spark, sfDir).count())
    // variants can never exceed group membership
    assert(out.filter($"n_variants" > $"n_dups" || $"n_variants" < 1).count() == 0)
    // canonical groups are at most as many as byte-exact groups
    assert(out.count() <= q("q_dedup_exact").count())
    // toy: case / punctuation / whitespace variants fold into one group,
    // a genuinely different doc stays separate (same plan shape)
    val toy = Seq(
      (1L, "Hello, World!"), (2L, "hello   world"), (3L, "HELLO-WORLD"),
      (4L, "goodbye world")).toDF("doc_id", "text")
    val folded = toy
      .groupBy(
        md5(trim(regexp_replace(lower($"text"), "[^a-z0-9]+", " ")))
          .as("canon_key"),
        sha2($"text", 256).as("raw_key"))
      .agg(min($"doc_id").as("min_id"), count(lit(1)).as("n"))
      .groupBy("canon_key")
      .agg(min($"min_id").as("canonical_doc_id"), sum($"n").as("n_dups"),
        count(lit(1)).as("n_variants"))
      .collect().map(r => (r.getAs[Long]("canonical_doc_id"),
        r.getAs[Long]("n_dups"), r.getAs[Long]("n_variants"))).toSet
    assert(folded == Set((1L, 3L, 3L), (4L, 1L, 1L)))
  }

  test("near dedup: groups cover all docs, at most as many as exact") {
    import spark.implicits._
    val near = q("q_dedup_near")
    assert(near.agg(sum($"group_size")).as[Long].head() ==
      Tables.documents(spark, sfDir).count())
    assert(near.count() <= q("q_dedup_exact").count())
  }

  test("dedup idempotence: re-deduping canonical docs leaves them unchanged") {
    import spark.implicits._
    val canon = q("q_dedup_near").select($"canonical_doc_id".as("doc_id"))
    val docs = Tables.documents(spark, sfDir).join(canon, "doc_id")
    val regrouped = docs
      .groupBy(array_join(sort_array(array_distinct(
        operators.TextQueries.tokens($"text"))), " ").as("sig"))
      .count().filter($"count" > 1).count()
    assert(regrouped == 0)
  }

  test("text stats: per-lang docs sum to corpus size") {
    import spark.implicits._
    assert(q("q_text_stats").agg(sum($"n_docs")).as[Long].head() ==
      Tables.documents(spark, sfDir).count())
  }

  test("tfidf: df bounded by corpus size, idf >= 0 and anti-monotone in df") {
    import spark.implicits._
    val n = Tables.documents(spark, sfDir).count()
    val rows = q("q_tfidf").collect()
    assert(rows.forall(r => r.getAs[Long]("df") <= n && r.getAs[Double]("idf") >= 0.0))
    val sorted = rows.map(r => (r.getAs[Long]("df"), r.getAs[Double]("idf")))
    sorted.sliding(2).foreach {
      case Array((df1, idf1), (df2, idf2)) =>
        if (df1 > df2) assert(idf1 <= idf2)
      case _ =>
    }
  }

  test("sim topk: 5 neighbors per probe, cosine in [-1,1], no self-match") {
    import spark.implicits._
    val out = q("q_sim_topk")
    assert(out.groupBy("probe_id").count().filter($"count" =!= 5).count() == 0)
    assert(out.filter($"cosine" < -1.0 || $"cosine" > 1.0).count() == 0)
    assert(out.filter($"probe_id" === $"vec_id").count() == 0)
  }

  test("knn classify: vote recomputed from q_sim_topk's neighbor sets matches") {
    import spark.implicits._
    val out = q("q_knn_classify").cache()
    val probes = q("q_sim_topk").select($"probe_id").distinct().count()
    assert(out.count() == probes)
    assert(out.filter($"votes" < 1 || $"votes" > 5).count() == 0)
    // independent recompute: take q_sim_topk's neighbors, join langs,
    // majority-vote locally
    val labels = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = q("q_sim_topk").select($"probe_id", $"vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) =>
        val byLang = rs.map(r => labels(r.getLong(1)))
          .groupBy(identity).map { case (l, xs) => (l, xs.length.toLong) }
        val (lang, votes) = byLang.toSeq.minBy { case (l, v) => (-v, l) }
        (p, lang, votes, labels(p))
      }.toSet
    val got = out.collect().map(r => (r.getAs[Long]("probe_id"),
      r.getAs[String]("pred_lang"), r.getAs[Long]("votes"),
      r.getAs[String]("true_lang"))).toSet
    assert(got == expect)
    assert(out.filter($"correct" =!= ($"pred_lang" === $"true_lang")).count() == 0)
    out.unpersist()
  }

  test("sim: cosine of a vector with itself is 1") {
    import spark.implicits._
    import operators.SimilarityQueries._
    val self = Tables.embeddings(spark, sfDir).limit(20)
      .select(asDoubles($"embedding").as("v"))
      .select((dot($"v", $"v") / (l2Norm($"v") * l2Norm($"v"))).as("c"))
      .filter(abs($"c" - 1.0) > 1e-9).count()
    assert(self == 0)
  }

  test("udaf_demo equals q_wordcount exactly") {
    val a = q("udaf_demo")
    val b = q("q_wordcount")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("bloom decontamination is row-identical to the exact form") {
    val exact = q("q_decontaminate")
    val bloom = q("q_decontaminate_bloom")
    assert(exact.exceptAll(bloom).count() == 0 &&
      bloom.exceptAll(exact).count() == 0)
  }

  test("pack: covers every doc once; only a pack's last doc may overrun") {
    import spark.implicits._
    val out = q("q_pack")
    val docs = Tables.documents(spark, sfDir)
    assert(out.agg(sum($"n_docs")).as[Long].head() == docs.count())
    // doc ranges within a (source, shard) never overlap: packs ordered
    // by pack_id have non-decreasing disjoint [first_doc, last_doc]
    val overlaps = out.as("a").join(out.as("b"),
      $"a.source" === $"b.source" && $"a.shard" === $"b.shard" &&
        $"a.pack_id" < $"b.pack_id" && $"a.last_doc" >= $"b.first_doc")
    assert(overlaps.count() == 0)
    // a multi-doc pack's tokens-before-last-doc stay under the budget
    // (the budget crossing is what opens the next pack); with the last
    // doc it may overrun. Proven via the pack re-derived bound:
    // n_docs > 1 implies pack_tokens - (tokens of last doc) < 512.
    val lastTok = docs
      .select(pmod($"doc_id", lit(8)).as("shard"), $"source",
        $"doc_id".as("last_doc"),
        size(operators.TextQueries.tokens($"text")).cast("long").as("last_tokens"))
    val bad = out.filter($"n_docs" > 1)
      .join(lastTok, Seq("source", "shard", "last_doc"))
      .filter($"pack_tokens" - $"last_tokens" >= 512)
    assert(bad.count() == 0)
  }

  test("bm25: equals a local recompute; plan has zero data shuffles") {
    import spark.implicits._
    val terms = operators.TextQueries.Bm25Terms
    val df = SparkEntry.queries("q_bm25")(spark, sfDir)
    // local recompute with the same double algebra over the same
    // tokenization, on ALL docs (the query truncates to top-20 after
    // ordering, so local top-20 must match row-for-row)
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> t.split("[^a-z]+").filter(_.nonEmpty)
    }
    val n = toks.length
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val dfs = terms.map(t => toks.count(_._2.contains(t)))
    val expected = toks.flatMap { case (id, ts) =>
      val tfs = terms.map(t => ts.count(_ == t))
      if (tfs.sum == 0) None
      else {
        val score = terms.indices.map { i =>
          val tf = tfs(i).toDouble
          val idf = math.log(1.0 + ((n - dfs(i)).toDouble + 0.5) /
            (dfs(i).toDouble + 0.5))
          idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 *
            (ts.length.toDouble / avgdl))))
        }.sum
        Some((id, tfs.count(_ > 0),
          BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
      }
    }.sortBy { case (id, _, rounded) => (-rounded, id) }.take(20).toSeq
    val got = df.as[(Long, Int, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == expected.map(r => (r._1, r._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) <= 1e-6, s"doc ${g._1}: ${g._3} vs ${e._3}")
    }
    // the scale claim: no ShuffleExchange anywhere — stats flow back in
    // through a broadcast, scoring is column algebra over the scan
    def flat(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flat(a.executedPlan)
      case q => q +: q.children.flatMap(flat)
    }
    val nodes = flat(df.queryExecution.executedPlan)
    val shuffles = nodes.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
      "q_bm25's only exchange should be the 1-row-per-partition stats " +
        s"collapse; got ${shuffles.map(_.outputPartitioning)}")
  }

  test("q_vocab_growth: curve closes on exact totals and never decreases") {
    import org.apache.spark.sql.functions._
    val out = q("q_vocab_growth").collect().sortBy(_.getAs[Long]("bucket"))
    val docs = Tables.documents(spark, sfDir)
    val tok = docs.select(explode(
      operators.TextQueries.tokens(col("text"))).as("t"))
    assert(out.last.getAs[Long]("cum_vocab") == tok.distinct().count())
    assert(out.last.getAs[Long]("cum_tokens") == tok.count())
    assert(out.map(_.getAs[Long]("n_new_types")).sum ==
      out.last.getAs[Long]("cum_vocab"))
    val cums = out.map(_.getAs[Long]("cum_vocab")).toSeq
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    // Heaps: new types per bucket should trail token occupancy
    out.foreach(r =>
      assert(r.getAs[Long]("n_new_types") <= r.getAs[Long]("n_tokens")))
  }
}
