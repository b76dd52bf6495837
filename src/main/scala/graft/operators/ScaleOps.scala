package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling building blocks (SURVEY.md §4.1: the reference has
  * none — one hot key = one slow reduce task). First line of defense is
  * AQE's runtime skew-join splitting (on in Bench); these utilities are
  * the explicit fallback for aggregations and for joins whose skew AQE
  * can't see (e.g. post-explode hot keys).
  *
  * Both are pure plan rewrites — results are identical to the unsalted
  * form for any input.
  */
object ScaleOps {

  /** Deterministic pseudo-random salt in [0, buckets) derived from the
    * full row content (stable under task retry, unlike rand()/
    * monotonically_increasing_id).
    */
  private def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(buckets))

  /** Two-phase salted count: groupBy(key, salt) partial counts →
    * groupBy(key) final sum. A key with 10^9 rows becomes `buckets`
    * parallel partials instead of one hot reducer.
    */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(df, buckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("cnt"))

  /** Oracle query over the salted two-phase aggregation: per-type event
    * counts through saltedCount, hash-checked against a plain GROUP BY
    * oracle — proving the salted rewrite is result-identical, under the
    * driver's hard signal. event_type is the classic low-cardinality /
    * high-skew key the rewrite exists for.
    */
  def qSaltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    saltedCount(graft.Tables.events(spark, sfDir), "event_type", buckets = 16)
      .orderBy(asc_nulls_first("event_type"))

  /** Oracle query over the salted join: orders ⋈ customer through
    * saltedJoin (salted big side, replicated small side), aggregated to
    * the exact q_join_inner result — the join rewrite proven
    * result-identical under the driver's hash compare.
    */
  def qSaltedJoin(spark: SparkSession, sfDir: String): DataFrame =
    saltedJoin(graft.Tables.orders(spark, sfDir),
      graft.Tables.customer(spark, sfDir), "o_custkey", "c_custkey", buckets = 16)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_revenue"))
      .orderBy(asc_nulls_first("c_mktsegment"))

  /** Persist a DataFrame as a bucketed, bucket-sorted table: rows are
    * hash-partitioned into `nBuckets` files by `key` at WRITE time, so
    * any later equi-join or aggregation on `key` between tables
    * bucketed the same way needs NO exchange — the join that would
    * shuffle 100 TB every run instead shuffles once, at ingest. This is
    * the engine's co-located-join story (the reference's fixed
    * nReduce=10 hash sharding is exactly a 10-bucket layout, but it
    * never exploits it on the read side).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Shuffle-free equi-join of two same-bucketed tables (see
    * writeBucketed). The plan must contain no Exchange on either side —
    * asserted by BucketedJoinSpec.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))

  /** Skew-safe inner equi-join: the big (skewed) side gets a
    * row-derived salt; the small side is replicated `buckets` times so
    * every (key, salt) bucket finds its match. Equivalent to
    * big ⋈ small on keyBig = keySmall, but the hot key's rows spread
    * over `buckets` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", rowSalt(big, buckets))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }

  /** Z-order cell map of the events table: events bucketed on the
    * (user_id, ⌊value/8⌋) grid with each cell's Morton interleave key
    * (`Sources.morton2` — the clustering key `writeZOrdered` lays
    * files out by). The oracle recomputes the interleave bit-by-bit in
    * SQL, checking the exact bit algebra both the query and the layout
    * writer rely on; ZOrderLayoutSpec separately proves the layout
    * prunes. First 100 cells in z-curve order — the walk a clustered
    * scan would make.
    */
  def qZorder(spark: SparkSession, sfDir: String): DataFrame =
    zorderCellsFrom(graft.Tables.events(spark, sfDir))

  /** Frame-parameterized body of [[qZorder]] — ZOrderLayoutSpec drives
    * this with a >512-user synthetic frame where morton2's 9-bit
    * truncation actually collides, proving the tie-broken order.
    */
  def zorderCellsFrom(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        floor(col("value") / 8).cast("long").as("vbucket"))
      .groupBy("user_id", "vbucket")
      .agg(count(lit(1)).as("n_events"))
      .select(
        graft.sources.Sources.morton2(col("user_id"), col("vbucket"))
          .as("zcell"),
        col("user_id"), col("vbucket"), col("n_events"))
      // zcell alone is non-injective past 512 users/buckets (morton2
      // keeps 9 bits per key) — tie-break on the raw keys so the cut at
      // LIMIT 100 is deterministic at any scale, not just the sf0.01
      // fixture's 150 users. Oracle orders identically (ZorderSql).
      .orderBy(asc_nulls_first("zcell"), asc_nulls_first("user_id"),
        asc_nulls_first("vbucket"))
      .limit(100)
}
