package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._


/** TEMPORARY dev profiler for the ledger pipeline phases (round 12
  * optimization). Not part of the query surface; delete when done.
  */
object ProfLedger {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"[prof] === rep $rep ===")
      val docs = MinHashLedger.incrUniverse(spark, sfDir)
      val suffix = java.util.UUID.randomUUID().toString.replace("-", "")
      val bandTable = s"prof_band_$suffix"
      val labelTable = s"prof_lab_$suffix"
      t("init")(MinHashLedger.init(spark, bandTable))
      t("initPatch")(ClusterLedger.initPatch(spark, labelTable))
      try {
        (0 until 3).foreach { b =>
          val batch = docs.filter(pmod(col("doc_id"), lit(3)) === b)
          val bands = t(s"b$b bandRows+ckpt")(
            MinHashLedger.bandRows(batch).localCheckpoint(false))
          val pairs = t(s"b$b probe")(
            MinHashLedger.candidatesFromBands(spark, bands,
              bandTable, MinHashLsh.BucketCap).localCheckpoint(true))
          t(s"b$b writeSorted")(
            MinHashLedger.writeSorted(bands, bandTable, SaveMode.Append))
          t(s"b$b ingestPatch")(ClusterLedger.ingestPatchEphemeral(spark,
            batch.select(col("doc_id").as("id")),
            pairs.select(col("doc_id_1").as("src"), col("doc_id_2").as("dst")),
            labelTable))
        }
        t("resolve")(ClusterLedger.resolvePatch(spark, labelTable)
          .orderBy("id").localCheckpoint(true))
      } finally {
        t("drops") {
          spark.sql(s"DROP TABLE IF EXISTS $bandTable")
          spark.sql(s"DROP TABLE IF EXISTS $labelTable")
          spark.sql(s"DROP TABLE IF EXISTS ${labelTable}_patch")
        }
      }
    }
    spark.stop()
  }
}
