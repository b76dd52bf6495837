package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Hive-style partitioned layout: pruning must happen at PLANNING time
  * (the scan's selected partitions, not a post-hoc filter), and a
  * dynamic partition overwrite must touch only the partitions present
  * in the incoming batch. This is the 100 TB data-layout contract — a
  * day-filtered query over a 3-year corpus lists one directory, and the
  * daily rerun republishes one day without rewriting the rest.
  */
class PartitionedLayoutSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case n => n +: n.children.flatMap(flatten)
  }

  private lazy val layoutDir: String = {
    val dir = Files.createTempDirectory("events_partitioned_").toString
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
    Sources.writePartitioned(ev, dir, Seq("day"))
    dir
  }

  test("roundtrip preserves rows and derives the partition column") {
    val ev = Tables.events(spark, sfDir)
    val back = spark.read.parquet(layoutDir)
    assert(back.count() == ev.count())
    assert(back.columns.contains("day"))
    // partition values equal the derived day of each row's ts
    val bad = back.filter(to_date(col("ts")) =!= col("day")).count()
    assert(bad == 0)
  }

  test("a day filter prunes to exactly the matching partition at planning time") {
    import spark.implicits._
    val back = spark.read.parquet(layoutDir)
    val someDay = back.select(max($"day")).head().getDate(0)
    val filtered = back.filter($"day" === lit(someDay))

    val scans = flatten(filtered.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no file scan in the plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "day predicate did not reach the scan's partition filters")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scan selected ${scan.selectedPartitions.partitionCount}")

    val allParts = flatten(back.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }.head.selectedPartitions.partitionCount
    assert(allParts > 1, "fixture produced a single partition — pruning untestable")
    // and the pruned read returns exactly that day's rows
    assert(filtered.count() ==
      back.filter(to_date($"ts") === lit(someDay)).count())
  }

  test("dynamic partition overwrite replaces only the incoming day") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_dyn_overwrite_").toString
    val ev = Tables.events(spark, sfDir).withColumn("day", to_date(col("ts")))
    Sources.writePartitioned(ev, dir, Seq("day"))
    val before = spark.read.parquet(dir)
    val days = before.select($"day").distinct().orderBy($"day").as[java.sql.Date].collect()
    assert(days.length >= 2, "need at least two partitions for the overwrite test")
    val target = days(0)

    // republish the target day with only its first event per user
    val v2 = before.filter($"day" === lit(target))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)))
      .filter($"rn" === 1).drop("rn")
    val v2Count = v2.count()
    Sources.overwritePartitions(v2, dir, Seq("day"))

    val after = spark.read.parquet(dir)
    assert(after.filter($"day" === lit(target)).count() == v2Count,
      "target partition was not replaced")
    // every other partition is untouched, row for row
    val othersBefore = before.filter($"day" =!= lit(target))
    val othersAfter = after.filter($"day" =!= lit(target))
    assert(othersAfter.count() == othersBefore.count() &&
      othersAfter.exceptAll(othersBefore).count() == 0,
      "dynamic overwrite disturbed a partition not present in the batch")
  }
}
