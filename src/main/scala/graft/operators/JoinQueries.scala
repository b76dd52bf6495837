package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The join surface: equi (shuffle + broadcast), outer, semi, anti,
  * range (equi + residual), and as-of. The reference derives joins from
  * its single shuffle primitive (`/root/reference/mr/worker.go:125-153`
  * hash-partitions by key exactly like a shuffled join's exchange); here
  * each variant is a declarative `Dataset.join` so Catalyst picks
  * broadcast-hash vs sort-merge from stats and AQE can re-plan at runtime.
  *
  * Scale notes (100 TB): dimension tables (region 5 rows, nation 25) are
  * explicitly `broadcast()` — never shuffled. Fact⋈fact joins
  * (orders⋈customer, events⋈orders) shuffle on the join key, which is the
  * partitioning a real cluster wants; none of them collect to the driver.
  * Deterministic double math: 2-dp monetary doubles are summed through
  * DECIMAL(18,2/4) casts (exact, engine-order-independent) then cast back
  * to double so the DuckDB oracle matches bit-for-bit at 6-dp formatting.
  */
object JoinQueries {

  /** orders ⋈ customer on custkey; revenue + order count per market
    * segment. Shuffle-on-key join at scale; AQE may still broadcast the
    * small side at bench SF.
    */
  def qJoinInner(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_revenue"))
      .orderBy(asc_nulls_first("c_mktsegment"))

  /** lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, revenue per region.
    * nation/region are hint-broadcast (25 and 5 rows — they would be
    * broadcast at ANY scale); the lineitem⋈orders⋈customer chain shuffles
    * on the join keys. Revenue = extprice·(1−discount) is exact in
    * DECIMAL(18,4) since both factors have 2 dp.
    */
  def qJoinBroadcast(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_lines"),
        // exact integer-cents math (see AggQueries.cents): long codegen,
        // no per-row decimal allocation on the 600k-row fact side
        (sum(round(col("l_extendedprice") * 100).cast("long") *
             (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .cast("double") / 10000.0).as("revenue"))
      .orderBy(asc_nulls_first("r_name"))

  /** customer LEFT JOIN orders — customers without orders appear with
    * n_orders = 0 (null-safe count of the right key).
    */
  def qJoinLeft(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), lit(0.0))
          .as("total_spent"))
      .orderBy(asc_nulls_first("c_custkey"))

  /** Customers with at least one order over 300k — LEFT SEMI keeps the
    * probe side only (no row multiplication, no right columns shuffled).
    */
  def qJoinSemi(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(
        Tables.orders(spark, sfDir).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy(asc_nulls_first("c_custkey"))

  /** Customers with no order above 300k — LEFT ANTI against the filtered
    * orders (the bare no-orders-at-all variant is empty at every SF, so
    * this keeps the check non-trivial). The filter is pushed below the
    * join build side.
    */
  def qJoinAnti(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(
        Tables.orders(spark, sfDir).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy(asc_nulls_first("c_custkey"))

  /** supplier ⋈ customer on nationkey plus a residual range predicate
    * |s_acctbal − c_acctbal| < 100. The equi key carries the shuffle; the
    * range term evaluates as a post-join filter (never a cartesian).
    * Subtraction of identical input doubles is IEEE-deterministic, so no
    * rounding is needed for the comparison.
    */
  def qJoinRange(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir).as("s")
      .join(Tables.customer(spark, sfDir).as("c"),
        col("s.s_nationkey") === col("c.c_nationkey") &&
          abs(col("s.s_acctbal") - col("c.c_acctbal")) < 100.0)
      .groupBy(col("s.s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(asc_nulls_first("nationkey"))

  /** Full outer join over genuinely overlapping-but-distinct key
    * spaces: per-id order activity ⟗ per-id event activity (the events
    * user space and the orders customer space each contain ids the
    * other lacks, so both unmatched sides are non-empty). Aggregates
    * first, then joins — the full-outer carries one row per id, not one
    * per fact row.
    */
  def qJoinFull(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("id"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spent"))
    val e = Tables.events(spark, sfDir)
      .groupBy(col("user_id").as("id"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spent"), lit(0.0)).as("total_spent"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(asc_nulls_first("id"))
  }

  /** Purchase attribution via the banded as-of operator
    * (AsofJoin.asofBackwardBanded): each purchase joins the same
    * user's most recent click within the preceding hour. The tolerance
    * bounds the join fan-out per purchase to the clicks in two 1-hour
    * bands of one user, regardless of how long the user's total click
    * history grows — the unbounded-history mitigation q_join_asof's
    * doc describes, as a first-class oracle query. Times are compared
    * in unix micros (session TZ is UTC on both engines). A strict
    * same-row exclusion is unnecessary: left and right are disjoint
    * event types.
    */
  def qJoinAsofBanded(spark: SparkSession, sfDir: String): DataFrame = {
    val tolUs = 3600L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts_us").as("c_ts_us"),
        col("ts").as("click_ts"), col("event_id").as("click_id"))
    AsofJoin.asofBackwardBanded(purchases, clicks,
      leftKey = "user_id", rightKey = "c_user_id",
      leftTime = "ts_us", rightTime = "c_ts_us",
      leftId = "event_id", rightTieBreak = "click_id", tolerance = tolUs)
      .select("event_id", "user_id", "ts", "click_id", "click_ts")
      .orderBy(asc_nulls_first("event_id"))
  }

  /** Batch form of the stream-stream interval join (EventStreams
    * .purchaseClickPairs, whose streaming run StreamingSmokeSpec proves
    * emits exactly these pairs): every (purchase, click) of one user
    * with the click inside the hour before the purchase, aggregated per
    * purchase into click count + latest click. The equi-key is user_id
    * — one shuffle each side — with the time band as a residual join
    * predicate, so per-purchase fan-out is bounded by one user's clicks
    * in a 1-hour band no matter how long the stream history grows (the
    * same state-bounding argument the streaming twin's watermark
    * eviction makes). Times compare in unix micros, exact on both
    * engines.
    */
  def qJoinInterval(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("ts_us").as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts_us").as("c_us"))
    purchases
      .join(clicks,
        col("user_id") === col("c_user_id") &&
          col("c_us") <= col("p_us") && col("c_us") > col("p_us") - hourUs)
      .groupBy("purchase_id", "user_id", "p_ts")
      .agg(
        count(lit(1)).as("n_clicks"),
        max(col("click_id")).as("max_click_id"),
        max(col("c_us")).as("last_click_us"))
      .orderBy(asc_nulls_first("purchase_id"))
  }

  /** As-of join: for each event, the latest order of the same user with
    * o_orderdate <= ts. Spark has no native ASOF; this is the
    * union-merge form (AsofJoin.asofBackwardUnion): both sides tagged
    * and unioned, one window per user carries the running most-recent
    * order onto each event — ONE shuffle on user_id and an
    * intermediate that never exceeds |events| + |orders|, versus the
    * join-then-prune form whose fan-out is |events| × per-user order
    * history. Times union as unix micros (date → midnight UTC, the
    * same coercion SQL's date <= timestamp comparison applies) and
    * round-trip exactly.
    * Ref: the reference has no joins at all — this is north-star surface.
    */
  def qJoinAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        // parquet stores o_orderdate as TIMESTAMP_NTZ; the UTC-session
        // cast is wall-clock-preserving, so od_us is the exact instant
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
    AsofJoin.asofBackwardUnion(ev, ord,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts_us", rightTime = "od_us",
      leftId = "event_id", rightTieBreak = "o_orderkey")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"),
        col("o_orderkey"),
        // back to TIMESTAMP_NTZ — the type the parquet column has, so
        // the output schema is identical to the join-form's
        timestamp_micros(col("od_us")).cast("timestamp_ntz").as("o_orderdate"))
      .orderBy(asc_nulls_first("event_id"))
  }

  /** Bloom-pruned selective join (semi-join reduction): lineitem ⋈ the
    * ~10% of parts with p_size ≤ 5. A plain shuffle join exchanges the
    * ENTIRE fact side even though ~90% of its rows can never match; a
    * Bloom filter built from the filtered dim's join keys (fixed-size,
    * ~1.2 MB/million keys at 1% fpp) prunes the fact stream
    * executor-locally BEFORE the exchange, so the shuffle carries only
    * might-match rows. False positives are removed by the join itself —
    * result row-identical to the plain join, which is the oracle.
    *
    * This hand-built form documents the pattern; on a real cluster the
    * same rewrite is Spark's runtime row-level filter
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), which injects
    * it automatically when the creation side is selective — kept off in
    * the session so the demonstrated plan is explicit, not planner-
    * dependent. The prune runs on the NATIVE BloomFilterMightContain
    * expression (graft.functions.BloomPrune), so it codegens inside
    * the fact scan's WholeStageCodegen span; the filter binary is the
    * one driver-side model value (built by BloomFilterAggregate on
    * executors — the `count()` is a driver scalar sizing it).
    */
  def qJoinBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = Tables.part(spark, sfDir)
      .filter(col("p_size") <= 5)
      .select("p_partkey", "p_brand")
    val bf = graft.functions.BloomPrune.bloomBinary(
      dim, col("p_partkey"), dim.count(), 0.01)
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity")
      .filter(graft.functions.BloomPrune.mightContain(bf, col("l_partkey")))
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_lines"),
        (sum(round(col("l_quantity") * 100).cast("long"))
          .cast("double") / 100.0).as("total_qty"))
      .orderBy(asc_nulls_first("p_brand"))
  }

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * MATCH each other instead of vanishing — the semantics a data-vault
    * or late-binding dimension join needs when "unknown" is itself a
    * bucket. Keys are manufactured by nulling out nation 3 on both
    * sides (the fixture has no null keys), so the null bucket really
    * exercises the null=null path; the output row with a NULL key is
    * the proof.
    *
    * Scale: Spark plans `<=>` as an ordinary hash join with null-safe
    * key equality — same exchange as q_join_inner, no BNLJ. The one
    * caveat at 100 TB: ALL null-keyed rows co-locate in one partition
    * (null is one key), so a null-heavy corpus needs the same salting
    * treatment as any hot key (q_salted_join).
    */
  def qJoinNullsafe(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"),
        nullif(col("c_nationkey").cast("int"), lit(3)).as("k"))
    val nat = Tables.nation(spark, sfDir)
      .select(nullif(col("n_nationkey").cast("int"), lit(3)).as("k"),
        col("n_name"))
    cust.join(nat, cust("k") <=> nat("k"))
      .groupBy(cust("k").as("nation_key"), col("n_name"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("c_custkey")).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("sum_acctbal"))
      .orderBy(asc_nulls_first("nation_key"), asc_nulls_first("n_name"))
  }
}
