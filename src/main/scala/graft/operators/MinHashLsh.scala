package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextQueries.tokens

/** Banded MinHash-LSH near-duplicate detection — the 100 TB path that
  * q_dedup_minhash's exact signature grouping approximates. Pipeline:
  * per-doc minhash signature (numHashes salted md5 min-hashes) → split
  * into bands → docs sharing any band bucket become candidate pairs →
  * candidates verified with EXACT token-set Jaccard. Only same-bucket
  * pairs are ever joined, so the quadratic pair space never
  * materializes; the shuffle keys are (band, bucket-hash). Verification
  * gives perfect precision; recall is the standard 1−(1−s^r)^b curve.
  *
  * Kept out of the oracle set (LSH is probabilistic in recall), but
  * deterministic end-to-end given the fixed salts — property-tested in
  * MinHashLshSpec.
  */
object MinHashLsh {

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands

  /** (band, bucket) keys holding more than this many signatures are
    * dropped before pair generation — the same guard as ShingleDfCap /
    * HammingBucketCap: a bucket of df docs explodes into df² candidate
    * pairs on one reducer, unbounded if one band value goes hot (e.g.
    * boilerplate docs whose band hashes all agree). Far above any band
    * population that matters for near-dup recall: a bucket of >10k
    * docs is a template/boilerplate cluster, not a pairwise near-dup
    * signal, and at a real corpus scale you widen the bands (more
    * RowsPerBand → exponentially more bucket values) AND keep the cap.
    */
  val BucketCap = 10000

  private def minhash(toksD: Column, i: Int): Column =
    array_min(transform(toksD, t => md5(concat(lit(s"mh$i:"), t))))

  /** (doc_id, sig: array<string> of NumHashes min-hashes). The distinct
    * token set materializes in its own projection so the 16 min-hash
    * transforms share one tokenization per row instead of re-running it.
    */
  def signatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => minhash(col("toks"), i)): _*).as("sig"))

  /** Candidate pairs: docs agreeing on all RowsPerBand hashes of at
    * least one band. One row per (doc_id_1 < doc_id_2) pair.
    *
    * Pair generation is group-by-bucket + within-group explosion, not a
    * banded self-join: ONE exchange on the (band, bucket) key instead of
    * two, and the count-over-window df guard runs on the already-
    * partitioned rows (one sort, no second shuffle — the shape measured
    * 3.7× faster than aggregate-then-join on the shingle analogue).
    * Buckets with df > bucketCap are dropped BEFORE any collect_list
    * accumulates, so one hot band value can neither blow a reducer's
    * memory nor emit its df² pair quadratic; df == 1 buckets (the vast
    * majority) never reach the collect either.
    */
  def candidatePairs(docs: DataFrame, bucketCap: Int = BucketCap): DataFrame = {
    require(bucketCap > 1, "bucketCap must exceed 1")
    // spread the CORPUS before the 16 min-hash transforms (the scan is
    // one split at fixture scale — guide §2.5); the ledger's per-batch
    // bandRows path deliberately does NOT spread: a delta batch is tiny
    // and the extra exchange measured slower there (q_dedup_incremental
    // 3.4 s unspread vs 4.7 s spread at sf0.1)
    val sig = signatures(graft.Tables.spread(docs, col("doc_id")))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until Bands).map(b =>
        concat_ws("|", (0 until RowsPerBand).map(r =>
          element_at(col("sig"), b * RowsPerBand + r + 1)): _*)): _*))
        .as(Seq("band", "bucket")))
      .select(col("doc_id"),
        concat_ws("#", col("band"), col("bucket")).as("bkey"))
      .repartition(col("bkey"))
    banded
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("bkey")))
      .filter(col("df") > 1 && col("df") <= bucketCap)
      .groupBy("bkey")
      .agg(collect_list(col("doc_id")).as("docs"))
      .select(explode(col("docs")).as("d1"), col("docs"))
      .select(col("d1"), explode(col("docs")).as("d2"))
      .filter(col("d1") < col("d2"))
      .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"))
      .distinct()
  }

  /** Candidates filtered by exact token-set Jaccard ≥ threshold. */
  def nearDupPairs(spark: SparkSession, sfDir: String, threshold: Double): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(tokens(col("text")))).as("t"))
    val sizes = docs.select(col("doc_id"),
      size(array_distinct(tokens(col("text")))).as("n"))
    val shared = candidatePairs(docs).as("p")
      .join(tok.as("ta"), col("p.doc_id_1") === col("ta.doc_id"))
      .join(tok.as("tb"),
        col("p.doc_id_2") === col("tb.doc_id") && col("ta.t") === col("tb.t"))
      .groupBy(col("p.doc_id_1").as("doc_id_1"), col("p.doc_id_2").as("doc_id_2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_id_1") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_id_2") === col("sb.doc_id"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sa.n") + col("sb.n") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_1", "doc_id_2", "jaccard")
  }
}
