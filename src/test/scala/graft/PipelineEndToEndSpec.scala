package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AdvancedTextQueries, DedupLedger, TextQueries, Upsert, ValidationQueries}

/** The whole training-data pipeline, composed from the shipped
  * operators in one pass over the corpus: ledger-based exact dedup →
  * MinHash near-dup pruning → Bloom decontamination → quality gate →
  * sequence packing + fixed-size chunking →
  * deterministic train/val/test split → partitioned corpus write.
  * Every stage is an operator tested elsewhere; this spec proves they
  * COMPOSE — schemas line up, counts stay consistent, and the final
  * artifact is a partitioned parquet corpus a trainer could read.
  */
class PipelineEndToEndSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("dedup → near-dup → quality → chunk → split composes end to end") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    val total = docs.count()

    // 1. exact dedup via the cross-run ledger
    val ledger = "e2e_ledger_t"
    DedupLedger.init(spark, ledger)
    val admitted =
      try DedupLedger.ingest(spark, docs, "text", "doc_id", ledger,
        Files.createTempDirectory("e2e_run_").toString)
      finally spark.sql(s"DROP TABLE IF EXISTS $ledger")
    val nExact = admitted.count()
    assert(nExact <= total && nExact > 0)

    // 2. near-dup pruning: keep only MinHash-canonical documents
    val canonical = AdvancedTextQueries.qDedupMinhash(spark, sfDir)
      .select($"canonical_doc_id".as("doc_id"))
    val pruned = admitted.join(canonical, "doc_id")
    val nNear = pruned.count()
    assert(nNear <= nExact && nNear > 0)

    // 3. benchmark decontamination: a held-out probe slice of the
    // corpus itself (every 50th doc) — survivors share no trigram with it
    val decon = TextQueries.bloomDecontaminate(spark,
      pruned.filter($"doc_id" % 50 =!= 0),
      pruned.filter($"doc_id" % 50 === 0))
    val nDecon = decon.count()
    assert(nDecon < nNear && nDecon > 0)

    // 4. quality gate (the q_pipeline thresholds)
    val toks = TextQueries.tokens($"text")
    val gated = decon
      .withColumn("n_tokens", size(toks))
      .withColumn("stop_ratio",
        size(filter(toks, t => t === "the" || t === "a")).cast("double") /
          size(toks))
      .filter($"n_tokens" >= 10 && $"stop_ratio" <= 0.5)
      .drop("n_tokens", "stop_ratio")
    val nGated = gated.count()
    assert(nGated <= nDecon && nGated > 0)

    // 5a. sequence packing of the survivors: every gated doc lands in
    // exactly one pack
    val packs = TextQueries.packTokenBudget(gated, budget = 512, nShards = 4)
    assert(packs.agg(sum($"n_docs")).as[Long].head() == nGated)
    assert(packs.filter($"pack_tokens" <= 0).count() == 0)

    // 5b. fixed-size chunking of the surviving docs
    val chunks = TextQueries.chunkTokensStrided(gated, 32, 32)
    assert(chunks.select("doc_id").distinct().count() == nGated)

    // 6. deterministic 80/10/10 split by content-free doc_id hash
    val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    val split = chunks.withColumn("split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
    val byPart = split.groupBy("split").agg(countDistinct($"doc_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(byPart.values.sum == nGated)
    assert(byPart.getOrElse("train", 0L) > byPart.getOrElse("val", 0L))

    // 7. partitioned corpus write — the trainer-facing artifact
    val outDir = Files.createTempDirectory("e2e_corpus_").toString
    split.write.partitionBy("split").mode("overwrite").parquet(outDir)
    val back = spark.read.parquet(outDir)
    assert(back.count() == split.count())
    assert(back.select("split").distinct().count() == byPart.size)
  }

  /** The governance loop around a corpus refresh: the batch must pass
    * its declarative DQ gate before any compute is spent on it; dedup
    * keeps the highest-quality member of each near-dup cluster (not an
    * arbitrary id); the kept set splits deterministically; and the
    * per-split counts tie out with the kept count exactly.
    */
  test("governance loop: DQ gate → keep-best dedup → stratified split ties out") {
    val docs = Tables.documents(spark, sfDir)

    // 1. admission gate: one aggregation pass, fail-fast semantics
    val gate = ValidationQueries.report(docs, Seq(
      "doc_id_unique" -> count_distinct($"doc_id"),
      "text_complete" -> count($"text"),
      "lang_domain" -> sum(when($"lang".rlike("^[a-z]{2}$"), 1L).otherwise(0L)),
      "n_chars_consistent" ->
        sum(when(length($"text") === $"n_chars", 1L).otherwise(0L))))
    assert(gate.count() == 4)
    assert(gate.filter(!$"passed").count() == 0,
      s"batch failed its DQ gate: ${gate.filter(!$"passed").collect().mkString}")

    // 2. keep-best dedup: representatives partition the corpus
    val kept = AdvancedTextQueries.qDedupKeepBest(spark, sfDir)
    val nKept = kept.count()
    assert(kept.agg(sum($"cluster_size")).as[Long].head() == docs.count())

    // 3. the kept set splits 80/10/10 by the same salted-hash convention
    // as q_split_train — disjoint and exhaustive by construction
    val bucket = conv(substring(
      md5(concat(lit("split:"), $"keep_doc_id".cast("string"))), 1, 4), 16, 10)
      .cast("long") % 100
    val split = kept.withColumn("split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
    val byPart = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byPart.values.sum == nKept)
    assert(byPart("train") > byPart.getOrElse("val", 0L))

    // 4. trainer-facing artifact: write partitioned, read back, tie out
    val outDir = Files.createTempDirectory("e2e_gov_").toString
    split.write.partitionBy("split").mode("overwrite").parquet(outDir)
    assert(spark.read.parquet(outDir).count() == nKept)
  }

  /** The daily maintenance loop a living corpus runs: each ingest run
    * dedups against the persistent ledger, MERGEs into the published
    * snapshot, and recomputes corpus stats — and run N's cost must be
    * proportional to BATCH N, which the scan-node audit pins down: the
    * incremental dedup plan may read this batch's files and the hash
    * ledger, never prior runs' corpora.
    */
  test("two-run maintenance loop: ledger → merge → stats; run 2 scans only batch 2") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "n_chars")
    val base = Files.createTempDirectory("e2e_runs_").toString
    // batch 2 re-ships a tenth of batch 1's content under fresh ids —
    // the re-crawl duplicates the ledger exists to drop
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$base/batch1")
    docs.filter($"doc_id" % 2 === 1)
      .unionAll(docs.filter($"doc_id" % 20 === 0)
        .withColumn("doc_id", $"doc_id" + 10000000L))
      .write.parquet(s"$base/batch2")
    val batch1 = spark.read.parquet(s"$base/batch1")
    val batch2 = spark.read.parquet(s"$base/batch2")

    val ledger = "e2e_ledger_two_run_t"
    DedupLedger.init(spark, ledger)
    try {
      // RUN 1: ingest → snapshot v1
      val admitted1 = DedupLedger.ingest(
        spark, batch1, "text", "doc_id", ledger, s"$base/run1")
      val n1 = admitted1.count()
      assert(n1 == batch1.select("text").distinct().count(),
        "run 1 must admit exactly batch 1's distinct contents")
      admitted1.write.parquet(s"$base/snap1")

      // RUN 2 scan audit BEFORE ingesting: the incremental dedup plan
      // reads only batch-2 files + the ledger — cost ∝ batch, not corpus
      val plan2 = DedupLedger.newRows(spark, batch2, "text", "doc_id", ledger)
        .queryExecution.executedPlan
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flatten(a.executedPlan)
        case q => q +: q.children.flatMap(flatten)
      }
      val scanRoots = flatten(plan2)
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toString) }
        .flatten
      assert(scanRoots.nonEmpty)
      scanRoots.foreach { p =>
        assert(p.contains("/batch2") || p.contains(ledger),
          s"run-2 dedup scans $p — an incremental run must not re-read prior runs")
      }

      // RUN 2: ingest batch 2, MERGE into snapshot v1 → v2
      val admitted2 = DedupLedger.ingest(
        spark, batch2, "text", "doc_id", ledger, s"$base/run2")
      assert(admitted2.join(admitted1, Seq("text_hash")).count() == 0,
        "re-shipped batch-1 content must be dropped by the ledger")
      val expected2 = batch2.select(sha2($"text", 256).as("h")).distinct()
        .join(batch1.select(sha2($"text", 256).as("h")).distinct(),
          Seq("h"), "left_anti").count()
      assert(admitted2.count() == expected2)
      val snap1 = spark.read.parquet(s"$base/snap1")
      Upsert.merge(snap1, admitted2, "doc_id", s"$base/snap2")
      val snap2 = spark.read.parquet(s"$base/snap2")
      assert(snap2.count() == n1 + expected2,
        "disjoint-key merge must be additive")

      // RUN 3: a retraction batch (tombstones) flows through the same MERGE
      val retract = snap2.orderBy($"doc_id").limit(7)
        .withColumn("_deleted", lit(true))
      Upsert.merge(snap2, retract, "doc_id", s"$base/snap3")
      val snap3 = spark.read.parquet(s"$base/snap3")
      assert(snap3.count() == snap2.count() - 7)
      assert(snap3.join(retract.select("doc_id"), Seq("doc_id")).count() == 0)

      // corpus stats over the published snapshot (the q_pipeline tail):
      // per-lang doc counts must tie out with the snapshot row count
      val stats = snap3
        .select($"lang", size(TextQueries.tokens($"text")).as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens".cast("long")).as("total_tokens"))
      assert(stats.agg(sum($"n_docs")).as[Long].head() == snap3.count())
      assert(stats.filter($"total_tokens" <= 0).count() == 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $ledger")
  }
}
