package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ClusterQueries

/** K-means checked three ways: a planted two-blob dataset with a known
  * partition, the tie-break contract on an equidistant point, and the
  * real-corpus invariants (total assignment, per-vector uniqueness,
  * two-phase ranking ≡ naive window).
  */
class ClusterSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  /** embeddings-shaped frame from (vec_id, label, vector). */
  private def embDF(rows: Seq[(Long, Int, Seq[Float])]) =
    rows.toDF("vec_id", "label", "embedding")

  test("planted blobs: two tight groups resolve into two clusters") {
    // group A around 0.1, group B around 0.9 (4-dim); init takes
    // vec_ids 0 and 1 — one from each group — so Lloyd separates them
    // in one round and holds.
    val a = Seq(0L, 2L, 4L, 6L).map(i =>
      (i, 0, Seq.fill(4)(0.1f + (i % 3) * 0.01f)))
    val b = Seq(1L, 3L, 5L, 7L).map(i =>
      (i, 1, Seq.fill(4)(0.9f - (i % 3) * 0.01f)))
    val out = ClusterQueries
      .kmeansAssign(spark, embDF(a ++ b), k = 2, iters = 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(out.keySet == (0L to 7L).toSet)
    val clustersA = a.map(r => out(r._1)).toSet
    val clustersB = b.map(r => out(r._1)).toSet
    assert(clustersA.size == 1 && clustersB.size == 1 &&
      clustersA != clustersB)
  }

  test("equidistant vector breaks the tie to the smaller cluster id") {
    // centroids settle at -1 and +1 (vec_ids 0, 1 init); vec 2 sits at
    // exactly 0 — dist to both is identical, so it must join cluster 0.
    val rows = Seq(
      (0L, 0, Seq(-1.0f, -1.0f)),
      (1L, 0, Seq(1.0f, 1.0f)),
      (2L, 0, Seq(0.0f, 0.0f)))
    val out = ClusterQueries
      .kmeansAssign(spark, embDF(rows), k = 2, iters = 0)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(out(2L) == 0)
  }

  test("real corpus: every vector assigned once, dist_sq >= 0, k bounded") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = ClusterQueries.kmeansAssign(spark, emb).cache()
    assert(out.count() == emb.count())
    assert(out.select("vec_id").distinct().count() == emb.count())
    assert(out.filter(col("dist_sq") < 0).count() == 0)
    assert(out.select("cluster").distinct().count() <= ClusterQueries.K)
    out.unpersist()
  }

  test("assignment distances match a naive interpreted fold") {
    // the |v|^2 - 2 v.c + |c|^2 expansion must equal the direct
    // sum((v-c)^2) fold on the same quantized grid
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 50)
    val q = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000000, 0)).as("qv"))
    val probe = q.orderBy("vec_id").limit(1).collect()(0)
      .getSeq[Double](1).toArray
    val direct = q.select(col("vec_id"),
        aggregate(
          zip_with(col("qv"), typedLit(probe.toSeq),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).cast("long").as("d"))
      .as[(Long, Long)].collect().toMap
    val viaDot = ClusterQueries
      .kmeansAssign(spark, emb, k = 1, iters = 0)
      .select("vec_id", "dist_sq").as[(Long, Long)].collect().toMap
    assert(viaDot == direct)
  }

  test("inertia curve: non-increasing across rounds, closes with the assignment") {
    val rows = graft.operators.ClusterQueries
      .qKmeansInertia(spark, sfDir)
      .as[(Int, Long, Long, Int)].collect().toSeq
    assert(rows.map(_._1) == (1 to graft.operators.ClusterQueries.Iters + 1))
    // Lloyd's invariant: each assignment and each update can only
    // lower total inertia
    assert(rows.sliding(2).forall { case Seq(a, b) => b._2 <= a._2 },
      s"inertia must be non-increasing: ${rows.map(_._2)}")
    // the last round IS the shipped assignment: same total
    val finalInertia = graft.operators.ClusterQueries
      .kmeansAssign(spark, Tables.embeddings(spark, sfDir))
      .agg(sum(col("dist_sq"))).as[Long].head()
    assert(rows.last._2 == finalInertia)
    assert(rows.forall(r => r._4 <= graft.operators.ClusterQueries.K))
  }

  test("silhouette: agrees with the kmeans assignment; b >= a; sil bounded") {
    val sil = ClusterQueries.qSilhouette(spark, sfDir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    val assign = ClusterQueries
      .kmeansAssign(spark, Tables.embeddings(spark, sfDir))
      .select("vec_id", "cluster", "dist_sq")
      .as[(Long, Int, Long)].collect()
    assert(sil.size == assign.length)
    assign.foreach { case (vid, cluster, distSq) =>
      val r = sil(vid)
      // own-centroid distance and cluster must be EXACTLY the shipped
      // assignment's — same model, same tie-break
      assert(r.getAs[Int]("cluster") == cluster)
      assert(r.getAs[Long]("a_sq") == distSq)
      // a is the argmin, so every rival distance is >= a, and the
      // silhouette of an argmin assignment is never negative... only
      // true when a == argmin, which IS the contract: b >= a => sil in [0, 1]
      assert(r.getAs[Long]("b_sq") >= r.getAs[Long]("a_sq"))
      val s = r.getAs[Double]("sil")
      assert(s >= 0.0 && s <= 1.0, s"sil $s out of [0,1] for vec $vid")
    }
  }

  test("diversity sample: two-phase ranking equals the naive global window") {
    val got = ClusterQueries.qDiversitySample(spark, sfDir)
      .as[(Int, Int, Long, Double)].collect().toSeq
    // naive form: one window per cluster over ALL scored docs
    val emb = Tables.embeddings(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val scored = ClusterQueries.kmeansAssign(spark, emb)
      .join(docs.select(col("doc_id"), col("text")),
        col("vec_id") === col("doc_id"))
    val naiveW = Window.partitionBy("cluster")
      .orderBy(desc("quality_score"), asc("doc_id"))
    val naive = scored
      .withColumn("quality_score",
        graft.operators.AdvancedTextQueries.qualityScore(col("text")))
      .withColumn("rank", row_number().over(naiveW))
      .filter(col("rank") <= 3)
      .select(col("cluster"), col("rank").cast("int"), col("doc_id"),
        col("quality_score"))
      .orderBy("cluster", "rank")
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(got == naive)
  }
}
