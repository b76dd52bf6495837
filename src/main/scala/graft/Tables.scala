package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the synthetic star schema at `$sfDir/<name>.parquet`
  * (see FIXTURES.md §2). Always load via these helpers so every query reads
  * through the same parquet datasource: Catalyst then gets predicate
  * pushdown + column pruning on the scan for free, which is the behavior
  * that matters at 100 TB (the reference instead reads whole files into
  * memory — `/root/reference/mr/worker.go:111-123`).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Timestamp normalization across testdata generations. Older fixtures
    * store `ts` as parquet TIMESTAMP(NANOS), which Spark cannot represent
    * (micros only): sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so the column arrives as
    * nanos-since-epoch LONG, and `ts DIV 1000` truncates to micros — the
    * exact same truncation DuckDB applies reading the file, keeping the
    * oracle comparable (integer division only: a double roundtrip would
    * lose precision above 2^53 ns). Newer fixtures store micros with
    * `isAdjustedToUTC=false`, which Spark 4 would surface as
    * TIMESTAMP_NTZ — a type `unix_micros`/`Row.getTimestamp` reject — so
    * sessions also set `spark.sql.parquet.inferTimestampNTZ.enabled=false`
    * to read it as the session-UTC TIMESTAMP the whole engine (and the
    * DuckDB oracle, which treats it as naive) already assumes.
    */
  private def eventsWithMicrosTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Spread a freshly-scanned frame across every core when the scan
    * cannot have produced enough splits (guide §2.5 "input skew: one
    * huge unsplittable file — repartition immediately after the read").
    * The fixtures are single-row-group parquet files, so every
    * pre-exchange map chain (tokenize, md5 fingerprints, MinHash
    * signatures, pair explodes) otherwise runs in ONE task regardless
    * of core count. Scale-adaptive, not a local-mode constant: the
    * guard compares the scan's stats size against parallelism ×
    * openCostInBytes — exactly the packing bound under which Spark
    * cannot emit one split per core — so a corpus-sized input (many
    * files / row groups) skips the extra exchange entirely, and the
    * shuffled volume in the small case is by construction under one
    * open-cost unit per core. Hash-keyed (never round-robin), so task
    * retries reproduce the same placement (guide §2.5 rand() caveat).
    */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val openCost = spark.sessionState.conf.filesOpenCostInBytes
    val small = df.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(p) * openCost
    if (small) df.repartition(p, key) else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsWithMicrosTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
