package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps

/** Salting rewrites must be result-identical to their unsalted forms on
  * skewed data; bucketed tables must join without an exchange.
  */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  // 1 hot key with 50k rows + 1k cold keys
  private lazy val skewed = spark.range(0, 50000).select(lit(0L).as("k"), $"id".as("v"))
    .unionAll(spark.range(1, 1001).select($"id".as("k"), ($"id" * 10).as("v")))

  test("saltedCount equals plain groupBy count on skewed data") {
    val salted = ScaleOps.saltedCount(skewed, "k")
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin equals plain join on skewed data") {
    val dim = (0L to 1000L).map(k => (k, s"name$k")).toDF("dk", "name")
    val salted = ScaleOps.saltedJoin(skewed, dim, "k", "dk").select("k", "v", "name")
    val plain = skewed.join(dim, $"k" === $"dk").select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("partitioned writes prune partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("part_").toString
    Tables.orders(spark, sfDir)
      .withColumn("order_year", year($"o_orderdate"))
      .write.partitionBy("order_year").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"order_year" === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      "year filter must prune partitions, not scan-and-filter:\n" + plan.take(1500))
    assert(pruned.count() ==
      Tables.orders(spark, sfDir).filter(year($"o_orderdate") === 1997).count())
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // production defaults (256 MB) scaled to the test corpus so the
    // hot key's partition registers as skewed
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = (0L to 1000L).map(k => (k, s"name$k")).toDF("dk", "name")
      val joined = skewed.join(dim, $"k" === $"dk")
      // execute through the Dataset's OWN QueryExecution — count() and
      // writes plan separate executions and would leave this plan
      // un-adapted; collect() runs exactly this one
      assert(joined.collect().length == 51000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not mark the hot-key join partition as skewed:\n" +
          finalPlan.take(1200))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions") {
    val dir = java.nio.file.Files.createTempDirectory("dpp_").toString
    Tables.events(spark, sfDir)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a real datasource with a surviving, LIKELY-
    // SELECTIVE filter: an inline LocalRelation constant-folds the
    // predicate away, and a bare boolean attribute does not count as
    // selective (nor does `=== true`, which BooleanSimplification
    // reduces to the bare attribute) — an EqualTo on an int does
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim_").toString
    Seq(("purchase", 1), ("click", 0), ("view", 0),
      ("error", 0), ("signup", 0)).toDF("etype", "flag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"flag" === 1)
    // the fact-side partition filter is only known at RUNTIME (it comes
    // out of the filtered dim) — DPP turns it into a pruning subquery
    // on the scan instead of reading all partitions
    val joined = fact.join(dim, $"event_type" === $"etype")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "expected a dynamic pruning predicate on the partitioned scan:\n" +
        plan.take(1500))
    assert(joined.count() ==
      Tables.events(spark, sfDir).filter($"event_type" === "purchase").count())
  }

  test("bucketed tables join without a shuffle exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("wh_").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark.range(0, 10000).select($"id".as("k"), ($"id" % 7).as("a"))
      val right = spark.range(0, 10000).select($"id".as("k"), ($"id" % 13).as("b"))
      left.write.format("parquet").bucketBy(8, "k").sortBy("k")
        .option("path", s"$warehouse/tl").mode("overwrite").saveAsTable("tl")
      right.write.format("parquet").bucketBy(8, "k").sortBy("k")
        .option("path", s"$warehouse/tr").mode("overwrite").saveAsTable("tr")
      val joined = spark.table("tl").join(spark.table("tr"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + plan.take(2000))
      assert(joined.count() == 10000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS tl")
      spark.sql("DROP TABLE IF EXISTS tr")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("partitionedRank matches the single-partition window exactly") {
    import org.apache.spark.sql.expressions.Window
    // negative values and heavy ties; (v, id) is the tie-broken total
    // order the operator's contract requires
    val df = spark.range(0, 5000).select($"id",
      (pmod($"id" * 2654435761L, lit(97)) - 48).as("v"))
    val order = Seq(col("v").asc, col("id").asc)
    // two sum types at once: long (the common case) and decimal(38,0)
    // (q_abc's exact-cents convention) — the offset coalesce must
    // coerce correctly for both
    val got = ScaleOps.partitionedRank(df, order,
      sums = Seq("run" -> col("v"),
        "dec" -> col("v").cast("decimal(38,0)")),
      numPartitions = 8)
    val w = Window.orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("run", sum($"v").over(wRun))
      .withColumn("dec", sum($"v".cast("decimal(38,0)")).over(wRun))
    val cols = Seq("id", "v", "rn", "run", "dec")
    assert(got.select(cols.map(col): _*)
      .exceptAll(want.select(cols.map(col): _*)).count() == 0)
    assert(want.select(cols.map(col): _*)
      .exceptAll(got.select(cols.map(col): _*)).count() == 0)
    // the broadcast scalars: one distinct (n_total, tot_run, tot_dec)
    // row equal to the grand totals
    val t = got.select("n_total", "tot_run", "tot_dec").distinct().collect()
    val sumV = df.agg(sum($"v")).head.getLong(0)
    assert(t.length == 1 && t(0).getLong(0) == 5000L &&
      t(0).getLong(1) == sumV &&
      t(0).getDecimal(2).longValueExact() == sumV)
    // empty input degenerates to an empty frame, not an error
    assert(ScaleOps.partitionedRank(df.filter(lit(false)), order,
      sums = Seq("run" -> col("v")), numPartitions = 8).count() == 0)
  }

  test("partitionedRank is deterministic across executions (boundary-sample independence)") {
    // Regression guard for the round-12 q_cliff_delta bug: range
    // boundaries come from SAMPLING a shuffle whose input order is
    // nondeterministic, so if the window branch and the stats branch
    // ever materialize the exchange independently (no checkpoint, no
    // AQE reuse), their pids disagree and every offset silently
    // corrupts — visible only as run-to-run variation of aggregates
    // over the running sums. A shuffled (hash-aggregated) input and a
    // cliff-delta-shaped fold reproduce it; 5 executions must agree.
    val ev = spark.range(0, 60000).select(
      (pmod($"id" * 104729, lit(15000)) / 100.0).as("value"),
      pmod($"id", lit(2)).as("side"))
    val byValue = ev.groupBy("value").agg(
      sum(when($"side" === 0, 1L).otherwise(0L)).as("c_a"),
      sum(when($"side" === 1, 1L).otherwise(0L)).as("c_b"))
    def fold(): (Long, Long) = {
      val cum = ScaleOps.partitionedRank(byValue,
        Seq(asc_nulls_first("value")),
        sums = Seq("cum_b" -> col("c_b")), numPartitions = 8)
      val r = cum.select(
        (col("c_a") * (col("cum_b") - col("c_b"))).as("gt"),
        (col("c_a") * (col("tot_cum_b") - col("cum_b"))).as("lt"))
        .agg(sum($"gt"), sum($"lt")).head
      (r.getLong(0), r.getLong(1))
    }
    val runs = (0 until 5).map(_ => fold())
    assert(runs.distinct.size == 1,
      s"partitionedRank fold is nondeterministic across executions: $runs")
  }

  test("ntileFromRank replicates the shared Spark/DuckDB ntile definition") {
    import org.apache.spark.sql.expressions.Window
    // n < b, n = b, n mod b = 0, and two remainder cases
    for (n <- Seq(3L, 10L, 23L, 97L, 100L)) {
      val df = spark.range(1, n + 1).select($"id")
      val want = df.withColumn("nt",
        ntile(10).over(Window.orderBy($"id".asc)).cast("long"))
      val bad = want
        .withColumn("nt2", ScaleOps.ntileFromRank($"id", lit(n), 10))
        .filter($"nt" =!= $"nt2")
      assert(bad.count() == 0, s"ntile mismatch at n=$n")
    }
  }
}
