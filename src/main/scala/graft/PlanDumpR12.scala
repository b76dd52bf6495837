package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `explain("formatted")` per query to `plans/<dir>/<query>_<tag>.txt`
  * — the optimization-round evidence files (one plan per file, named
  * before/after). Usage:
  *
  *   runMain graft.PlanDumpR12 <tag> <outDir> <q1,q2,...> [sfDir]
  *
  * Uses the same session shape as Bench (32 shuffle partitions, AQE on)
  * so the dumped initial plans match what the bench executes.
  */
object PlanDumpR12 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDumpR12 <tag> <outDir> <q1,q2,...> [sfDir]")
    val tag = args(0)
    val outDir = Paths.get(args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
      val txt = qe.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"[plandump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
