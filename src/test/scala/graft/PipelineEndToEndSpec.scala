package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AdvancedTextQueries, DedupLedger, TextQueries}

/** The whole training-data pipeline, composed from the shipped
  * operators in one pass over the corpus: ledger-based exact dedup →
  * MinHash near-dup pruning → quality gate → fixed-size chunking →
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

    // 3. quality gate (the q_pipeline thresholds)
    val toks = TextQueries.tokens($"text")
    val gated = pruned
      .withColumn("n_tokens", size(toks))
      .withColumn("stop_ratio",
        size(filter(toks, t => t === "the" || t === "a")).cast("double") /
          size(toks))
      .filter($"n_tokens" >= 10 && $"stop_ratio" <= 0.5)
      .drop("n_tokens", "stop_ratio")
    val nGated = gated.count()
    assert(nGated <= nNear && nGated > 0)

    // 4. fixed-size chunking of the surviving docs
    val chunks = TextQueries.chunkTokensStrided(gated, 32, 32)
    assert(chunks.select("doc_id").distinct().count() == nGated)

    // 5. deterministic 80/10/10 split by content-free doc_id hash
    val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    val split = chunks.withColumn("split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
    val byPart = split.groupBy("split").agg(countDistinct($"doc_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(byPart.values.sum == nGated)
    assert(byPart.getOrElse("train", 0L) > byPart.getOrElse("val", 0L))

    // 6. partitioned corpus write — the trainer-facing artifact
    val outDir = Files.createTempDirectory("e2e_corpus_").toString
    split.write.partitionBy("split").mode("overwrite").parquet(outDir)
    val back = spark.read.parquet(outDir)
    assert(back.count() == split.count())
    assert(back.select("split").distinct().count() == byPart.size)
  }
}
