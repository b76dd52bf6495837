package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.SimilarityQueries.{asDoubles, dot, l2Norm}

/** Random-hyperplane LSH for approximate nearest-neighbor search — the
  * scale path behind q_sim_topk's brute-force oracle. Each vector gets a
  * `NumPlanes`-bit sign signature against fixed pseudo-random
  * hyperplanes; probes only score candidates in the SAME bucket, so the
  * per-probe work drops from |corpus| to |bucket| (tunable via
  * NumPlanes). Hyperplanes come from a seeded RNG, so results are
  * deterministic run-to-run; recall is probabilistic by design
  * (property-tested against the brute-force result, not oracle-checked).
  *
  * At 100 TB: bucket the corpus once (cheap projection), partition by
  * bucket, broadcast the probes — no shuffle of the big side beyond the
  * one bucketing exchange; multi-probe (flipping low-margin bits) buys
  * recall without touching the partitioning.
  */
object LshKnn {

  val NumPlanes = 4
  val Dim = 64

  /** Fixed hyperplanes (seed 42) per dimensionality, materialized as
    * literal arrays in the plan — effectively broadcast constants. The
    * same seed always yields the same planes, so bucketing is
    * deterministic per (dim, plane index).
    */
  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[Int, Seq[Array[Double]]]

  private def planesFor(dim: Int): Seq[Array[Double]] =
    planeCache.getOrElseUpdate(dim, {
      val rng = new scala.util.Random(42)
      Seq.fill(NumPlanes)(Array.fill(dim)(rng.nextGaussian()))
    })

  private def planes: Seq[Array[Double]] = planesFor(Dim)

  private def planeCol(p: Array[Double]): Column =
    array(p.map(lit(_)).toIndexedSeq: _*)

  /** Sign-bit bucket id of a double-array vector column of `dim`
    * elements (defaults to the embeddings table's 64).
    */
  def bucket(vec: Column, dim: Int = Dim): Column =
    (0 until NumPlanes).map { i =>
      when(dot(vec, planeCol(planesFor(dim)(i))) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Multi-probe candidate buckets: the vector's own bucket plus, for
    * nFlip > 0, the buckets reached by flipping the sign bits with the
    * smallest |margin| — the hyperplanes this vector sits closest to,
    * which is exactly where a near neighbor lands on the other side.
    * Only probes fan out (nFlip+1 rows each); the corpus keeps its
    * single-bucket assignment and partitioning, so recall rises without
    * re-partitioning anything.
    */
  def probeBuckets(vec: Column, nFlip: Int): Column = {
    val dots = (0 until NumPlanes).map(i => dot(vec, planeCol(planes(i))))
    val base = dots.zipWithIndex.map { case (d, i) =>
      when(d > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    if (nFlip <= 0) array(base)
    else {
      val margins = array(dots.zipWithIndex.map { case (d, i) =>
        struct(abs(d).as("m"), lit(1 << i).as("bit"))
      }: _*)
      val flips = slice(array_sort(margins), 1, nFlip)
      concat(array(base), transform(flips, f => base.bitwiseXOR(f.getField("bit"))))
    }
  }

  /** Approximate top-k cosine neighbors per probe (vec_id % 100 = 0),
    * scored only within the probe's bucket.
    */
  def approxTopK(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame =
    approxTopKMultiProbe(spark, sfDir, k, nFlip = 0)

  /** approxTopK with multi-probe: each probe also scores the nFlip
    * lowest-margin neighboring buckets.
    */
  def approxTopKMultiProbe(spark: SparkSession, sfDir: String, k: Int = 5,
      nFlip: Int = 1): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDoubles(col("embedding")).as("vec"))
      .withColumn("bucket", bucket(col("vec")))
    val probes = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDoubles(col("embedding")).as("vec"))
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("vec").as("probe_vec"),
        explode(probeBuckets(col("vec"), nFlip)).as("bucket"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    emb.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        (round(dot(col("probe_vec"), col("vec")) /
          (l2Norm(col("probe_vec")) * l2Norm(col("vec"))), 6) + lit(0.0)).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .orderBy(asc_nulls_first("probe_id"), col("rank").asc)
  }
}
