package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Profile one ScaleSmoke operator at one replication factor:
  * `BenchOp <op> [k] [reps] [sfDir]`. The dev-loop companion to
  * [[BenchOne]] (which times SparkEntry queries at base scale): when a
  * SCALING.md cell looks superlinear, this isolates the op × scale
  * cell and honors `spark.sql.shuffle.partitions` /
  * `SPARK_GRAFT_CPUS` overrides so partitioning hypotheses are
  * testable without a 25-minute full ScaleSmoke run.
  */
object BenchOp {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOp <op> [k] [reps] [sfDir]"))
    val k = if (args.length > 1) args(1).toInt else 16
    val reps = if (args.length > 2) args(2).toInt else 3
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    def replicated(kk: Int): DataFrame =
      (0 until kk).map { i =>
        val tag = ('a' + i % 26).toChar.toString + ('a' + i / 26).toChar
        base.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "([a-z]+)", s"$$1x$tag").as("text"))
      }.reduce(_ unionAll _)
    // same replication as ScaleSmoke, materialized once so reps time
    // the operator, not the corpus construction — pass mat=0 to
    // include construction like ScaleSmoke does
    val materialize = sys.env.getOrElse("SPARK_GRAFT_MATERIALIZE", "1") == "1"
    lazy val corpus =
      if (materialize) replicated(k).localCheckpoint(true) else replicated(k)

    val ops: Map[String, () => DataFrame] = Map(
      "ngram_jaccard_pairs" -> (() =>
        AdvancedTextQueries.ngramJaccardPairs(corpus, AdvancedTextQueries.ShingleDfCap)),
      "shingle_rows" -> (() => AdvancedTextQueries.shingleRows(corpus)),
      "boilerplate_df3" -> (() => AnalyticsQueries.boilerplateFrom(corpus, 3)),
      "heavy_hitters_mg" -> (() => AnalyticsQueries.heavyHittersFrom(spark, corpus)),
      "minhash_lsh_candidates" -> (() => MinHashLsh.candidatePairs(corpus)))

    val fn = ops.getOrElse(name, sys.error(s"unknown op $name; have ${ops.keys.mkString(", ")}"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      println(f"[benchop] $name k=$k parts=$parts run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
