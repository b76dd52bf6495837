package graft

import java.nio.file.Files
import graft.operators.{IvfKnn, SimilarityQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Build-once-query-many: the IVF index persisted to parquet must
  * answer queries bit-identically to the freshly built one, and the
  * cell layout must let a query's probed cells prune at the partition
  * level.
  */
class IvfPersistSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("persisted IVF index answers queries identically to the fresh one") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), SimilarityQueries.asDoubles(col("embedding")).as("vec"))
    val (indexed, centroids) = IvfKnn.buildIndexFrom(emb)
    val fresh = IvfKnn.approxTopKFrom(indexed, centroids).collect()

    val path = Files.createTempDirectory("ivf_idx_").toString
    IvfKnn.saveIndex(indexed, centroids, path)
    val (li, lc) = IvfKnn.loadIndex(spark, path)
    val loaded = IvfKnn.approxTopKFrom(li, lc).collect()

    assert(fresh.nonEmpty)
    assert(fresh.sameElements(loaded),
      "loaded-index results diverge from fresh-index results")
    // the on-disk layout is one directory per cell — the unit the
    // query's cell equi-join can prune
    val cellDirs = new java.io.File(s"$path/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.length == lc.count(),
      "expected one partition directory per IVF cell")
  }
}
