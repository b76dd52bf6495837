package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.mr.{MapReduceCompat, ReferenceApps}

/** The migration surface: the reference's wc and indexer plugins run
  * unchanged through MapReduceCompat and produce the reference's output
  * contract on its own Gutenberg corpus.
  */
class MapReduceCompatSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val gutenberg = "/root/reference/main/pg-*.txt"
  private lazy val haveCorpus =
    Files.exists(Paths.get("/root/reference/main/pg-being_ernest.txt"))

  test("wc plugin through the compat API equals the DataFrame wordcount") {
    assume(haveCorpus)
    import spark.implicits._
    val viaMr = MapReduceCompat.transform(
      spark, ReferenceApps.wcMap, ReferenceApps.wcReduce, gutenberg)
      .toDF("word", "cnt")
      .select($"word", $"cnt".cast("long").as("cnt"))
    val viaDf = sources.Sources.wholeTextCorpus(spark, gutenberg)
      .select(explode(split($"content", "[^\\p{L}]+")).as("word"))
      .filter($"word" =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    assert(viaMr.exceptAll(viaDf).count() == 0 && viaDf.exceptAll(viaMr).count() == 0)
  }

  test("wc via the aggregated (combiner) path gives identical counts") {
    assume(haveCorpus)
    import spark.implicits._
    val viaAgg = MapReduceCompat.transformAggregated[Long](
      spark, ReferenceApps.wcMap,
      0L, (b, _) => b + 1, _ + _, _.toString, gutenberg)
      .toDF("word", "cnt")
    val viaMr = MapReduceCompat.transform(
      spark, ReferenceApps.wcMap, ReferenceApps.wcReduce, gutenberg)
      .toDF("word", "cnt")
    assert(viaAgg.exceptAll(viaMr).count() == 0 && viaMr.exceptAll(viaAgg).count() == 0)
  }

  test("indexer plugin: doc counts consistent, docs sorted") {
    assume(haveCorpus)
    import spark.implicits._
    val out = MapReduceCompat.transform(
      spark, ReferenceApps.indexerMap, ReferenceApps.indexerReduce, gutenberg)
      .toDF("word", "v")
    // "<n> <doc,doc,...>" with n = list length, list sorted
    val bad = out.select($"word",
        split($"v", " ").getItem(0).cast("int").as("n"),
        split(split($"v", " ").getItem(1), ",").as("docs"))
      .filter(size($"docs") =!= $"n" || $"n" < 1 || $"n" > 8)
      .count()
    assert(bad == 0)
  }

  test("full job writes the reference's output contract") {
    assume(haveCorpus)
    val outDir = Files.createTempDirectory("mrout_").toString
    MapReduceCompat.run(spark, ReferenceApps.wcMap, ReferenceApps.wcReduce,
      gutenberg, nReduce = 10, outDir)
    val parts = new java.io.File(outDir).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 10) // nReduce shards, like mr-out-0..9
    val lines = spark.read.text(outDir).count()
    assert(lines > 10000)
    // early_exit (mrapps/early_exit.go): when run() returns, the output
    // is fully committed — no in-flight temporary state, success marker
    // present. A reader starting at this instant sees complete output.
    val names = new java.io.File(outDir).listFiles().map(_.getName).toSet
    assert(!names.contains("_temporary"), "uncommitted output remains")
    assert(names.contains("_SUCCESS"), "commit marker missing")
  }
}
