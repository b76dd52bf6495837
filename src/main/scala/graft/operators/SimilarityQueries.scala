package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (64-dim float vectors).
  * Oracle-checked form: brute-force cosine top-k for a small probe set
  * (vec_id % 100 = 0) via a broadcast join — every executor scans its
  * slice of candidates against the broadcast probes, so the work is
  * embarrassingly parallel and shuffles only the per-probe top rows.
  * The 100 TB path replaces the full candidate scan with LSH bucketing
  * (see LshKnn) — approximate, hence outside the oracle set.
  *
  * Precision: floats are cast to double BEFORE any arithmetic (float
  * multiply rounds differently than double multiply of the same values),
  * and cosine is rounded to 6 dp BEFORE ranking so both engines rank the
  * identical value, with vec_id as the total tie-break.
  */
object SimilarityQueries {

  /** Elementwise double cast of an ArrayType(FloatType) column. */
  def asDoubles(c: Column): Column = transform(c, _.cast("double"))

  /** Codegen'd sequential dot product (graft.functions.DotProduct) —
    * bit-identical to the `aggregate(zip_with(...))` fold it replaces
    * (same ascending-index double accumulation), ~50× faster on pairwise
    * workloads because higher-order functions evaluate interpreted.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vecDot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Top-5 cosine neighbors for each probe vector (vec_id % 100 = 0).
    * Norms are computed ONCE per side before the join — the pairwise
    * stage does a single dot product per pair.
    */
  def qSimTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDoubles(col("embedding")).as("vec"))
      .repartition(spark.sparkContext.defaultParallelism)
    bruteTopKFrom(emb, k = 5)
  }

  /** DataFrame-core brute-force top-k: `emb` is (vec_id, array<double>
    * vec); probes are the rows with vec_id % probeModulus = 0. The
    * exact ground truth the ANN paths (LshKnn, IvfKnn) trade against —
    * graft.ScaleSmoke measures their recall against this at 1x/4x/16x.
    */
  def bruteTopKFrom(emb: DataFrame, k: Int = 5, probeModulus: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val normed = emb.withColumn("norm", l2Norm(col("vec")))
    val probes = normed
      .filter(col("vec_id") % probeModulus === 0)
      .select(col("vec_id").as("probe_id"), col("vec").as("probe_vec"),
        col("norm").as("probe_norm"))
    val pairs = normed
      .join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        (round(dot(col("probe_vec"), col("vec")) /
          (col("probe_norm") * col("norm")), 6) + lit(0.0)).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    pairs
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("probe_id", "vec_id", "cosine", "rank")
      .orderBy(asc_nulls_first("probe_id"), col("rank").asc)
  }

  /** Embedding-cosine near-duplicate pairs: all (a,b) with a < b and
    * 6-dp-rounded cosine ≥ 0.4. Oracle form is the exact pairwise join;
    * the 100 TB path buckets by random-hyperplane LSH first (LshKnn) so
    * only same-bucket pairs are scored. The filter applies to the
    * ROUNDED cosine so both engines cut at the identical value.
    */
  def qDedupEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    // The embeddings table is one parquet file → one input partition; the
    // pairwise nested-loop work is |corpus|² so spread the STREAMED side
    // over all cores first (the broadcast side ships whole either way).
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDoubles(col("embedding")).as("vec"))
      .withColumn("norm", l2Norm(col("vec")))
      .repartition(spark.sparkContext.defaultParallelism)
    emb.as("a")
      .join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id_1"),
        col("b.vec_id").as("vec_id_2"),
        (round(dot(col("a.vec"), col("b.vec")) /
          (col("a.norm") * col("b.norm")), 6) + lit(0.0)).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .orderBy(asc_nulls_first("vec_id_1"), asc_nulls_first("vec_id_2"))
  }
}
