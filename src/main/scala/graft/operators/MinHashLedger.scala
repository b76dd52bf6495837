package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental NEAR-dup detection across ingestion runs: a persistent,
  * bucketed ledger of MinHash band rows — DedupLedger's
  * cost-proportional-to-the-batch contract extended from exact
  * content hashes to the LSH band index.
  *
  * The ledger stores one row per (band, bucket) membership:
  * `(bkey, doc_id, sig)` with `bkey = band '#' bucket-hash` exactly as
  * `MinHashLsh.candidatePairs` keys its shuffle, and `sig` the full
  * NumHashes-slot signature (pipe-joined md5 hex strings). A new
  * batch:
  *
  *   1. computes its own band rows (one pass over the BATCH only),
  *   2. probes the ledger with a bkey equi-join — new docs meet
  *      previously-ingested docs ONLY inside a shared bucket, the
  *      same inverted-index pruning as the one-shot LSH, so prior
  *      corpora are never re-scanned or re-hashed,
  *   3. emits candidate pairs (new×old ∪ new×new) with the
  *      signature-estimated Jaccard (matching-slot fraction — the
  *      standard MinHash estimator, computable from the LEDGER alone,
  *      no old-document fetch),
  *   4. appends its band rows.
  *
  * Scale: the ledger is bucketed AND bucket-sorted by bkey, so its
  * side of the probe join reads co-located (no ledger-side exchange,
  * ever); the batch side exchanges once on bkey. Per-batch cost is
  * O(batch + matching buckets), flat in ledger size — measured in
  * SCALING.md's `minhash_ledger_batch*` rows. The same hot-bucket
  * guard as the one-shot path applies, accounted over ledger∪batch:
  * a (band, bucket) whose TOTAL population exceeds `bucketCap` emits
  * no pairs for this batch (boilerplate clusters, not near-dup
  * signal). Pairs already emitted while the bucket was small stay
  * emitted — the incremental cap is append-monotone, the one
  * documented divergence from re-running one-shot LSH on the full
  * corpus with a binding cap.
  *
  * Batch-ingest ≡ full-corpus equivalence (cap non-binding): every
  * pair of the one-shot `MinHashLsh.candidatePairs(allDocs)` shares
  * some bucket; whichever member arrives later finds the earlier one
  * in the ledger (or the same batch) through exactly that bucket —
  * proven pair-for-pair in MinHashLedgerSpec.
  */
object MinHashLedger {

  val NBuckets = 16

  /** Create the empty band-index ledger (bucketed by the probe key). */
  def init(spark: SparkSession, ledgerTable: String): Unit = {
    import spark.implicits._
    Seq.empty[(String, Long, String)].toDF("bkey", "doc_id", "sig")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(NBuckets, "bkey").sortBy("bkey")
      .saveAsTable(ledgerTable)
  }

  /** Band rows of a batch: (bkey, doc_id, sig) — one row per band per
    * doc, sig carried whole so pair estimation never refetches docs.
    */
  def bandRows(docs: DataFrame): DataFrame = {
    import MinHashLsh.{Bands, RowsPerBand}
    MinHashLsh.signatures(docs)
      .select(col("doc_id"), col("sig"),
        explode(array((0 until Bands).map(b =>
          concat_ws("#", lit(b.toString),
            concat_ws("|", (0 until RowsPerBand).map(r =>
              element_at(col("sig"), b * RowsPerBand + r + 1)): _*))): _*))
          .as("bkey"))
      .select(col("bkey"), col("doc_id"),
        array_join(col("sig"), "|").as("sig"))
  }

  /** Ingest one batch: emit its candidate near-dup pairs against the
    * corpus so far (including itself), then append its band rows. The
    * returned frame reads the materialized pair parquet at `runDir`,
    * so it stays valid after the ledger has absorbed the batch.
    *
    * Output: (doc_id_1 < doc_id_2, est_jaccard) — est_jaccard the
    * matching-signature-slot fraction, rounded 6 dp.
    */
  def ingest(spark: SparkSession, batch: DataFrame, ledgerTable: String,
      runDir: String, bucketCap: Int = MinHashLsh.BucketCap): DataFrame = {
    candidatePairsAgainst(spark, batch, ledgerTable, bucketCap)
      .write.mode(SaveMode.Overwrite).parquet(s"$runDir/pairs")
    bandRows(batch)
      .write.mode(SaveMode.Append).insertInto(ledgerTable)
    spark.read.parquet(s"$runDir/pairs")
  }

  /** Rewrite the ledger without duplicate (bkey, doc_id) rows. A
    * crashed-and-retried batch re-appends its band rows blindly
    * (at-least-once append is the cheap, lock-free contract — pair
    * output stays correct because emission dedupes per pair, and the
    * signature per (bkey, doc_id) is deterministic so duplicates are
    * bit-identical). What duplicates DO cost is ledger bloat and df
    * inflation toward `bucketCap`; a periodic compaction restores
    * minimality. The distinct fold materializes to `tmpDir` first —
    * a bucketed table cannot be overwritten from a plan that reads it.
    */
  def compact(spark: SparkSession, ledgerTable: String,
      tmpDir: String): Unit = {
    spark.table(ledgerTable)
      .groupBy("bkey", "doc_id").agg(min(col("sig")).as("sig"))
      .write.mode(SaveMode.Overwrite).parquet(tmpDir)
    spark.read.parquet(tmpDir)
      .select("bkey", "doc_id", "sig")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(NBuckets, "bkey").sortBy("bkey")
      .saveAsTable(ledgerTable)
  }

  /** The pre-append probe plan ingest materializes — exposed so tests
    * can audit it (and its scan set: this batch plus the band ledger,
    * never prior corpora).
    */
  def candidatePairsAgainst(spark: SparkSession, batch: DataFrame,
      ledgerTable: String, bucketCap: Int = MinHashLsh.BucketCap): DataFrame = {
    require(bucketCap > 1, "bucketCap must exceed 1")
    val fresh = bandRows(batch)
    val old = spark.table(ledgerTable)
    // hot-bucket guard over the POST-append population: the batch side
    // is one count fold of `fresh`; the ledger side's per-bkey counts
    // read co-located off the bucketed table
    val totals = old.groupBy("bkey").agg(count(lit(1)).as("n_old"))
      .join(fresh.groupBy("bkey").agg(count(lit(1)).as("n_new")),
        Seq("bkey"), "full_outer")
      .select(col("bkey"),
        (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L)))
          .as("df"))
    val okKeys = totals.filter(col("df") > 1 && col("df") <= bucketCap)
      .select("bkey")
    val freshOk = fresh.join(okKeys, Seq("bkey"))
    val corpusOk = old.join(okKeys, Seq("bkey")).unionAll(freshOk)
    val estJaccard = round(
      size(filter(zip_with(
        split(col("a.sig"), "\\|"), split(col("b.sig"), "\\|"),
        (x, y) => x === y), m => m)).cast("double") /
        size(split(col("a.sig"), "\\|")), 6) + lit(0.0)
    freshOk.as("a")
      .join(corpusOk.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_id_1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_id_2"),
        estJaccard.as("est_jaccard"))
      .groupBy("doc_id_1", "doc_id_2")
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }
}
