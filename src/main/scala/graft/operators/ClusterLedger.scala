package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained dedup CLUSTERS: the third stage of the
  * incremental curation story (exact hashes → DedupLedger, near-dup
  * candidate pairs → MinHashLedger, pairs → cluster labels → here).
  * A persistent (id, component) table holds the min-label connected
  * components of every pair emitted so far; each batch folds in only
  * its DELTA — the new docs and the pairs its MinHashLedger probe
  * emitted — never re-running components over the accumulated pair
  * graph.
  *
  * The delta fold is the standard super-node collapse: every prior
  * cluster is represented by its label (one vertex per cluster —
  * valid because ALL prior connectivity is inside prior clusters, so
  * any new merge must travel through a delta edge), delta edges map
  * endpoints to their super-nodes, and connected components run on
  * that collapsed graph — whose size is bounded by the DELTA (≤ 2
  * super-nodes per delta edge), not the corpus. Each super-node id is
  * its old cluster's minimum doc id, so the merged component's
  * min-label is the true min over every member doc — the incremental
  * labeling is bit-identical to a full recompute
  * (ClusterLedgerSpec proves it pair-for-pair on the fixture corpus
  * through the real MinHashLedger batch flow).
  *
  * Cost per batch: the delta CC (delta-sized), one broadcast-sized
  * remap table (old-label → new-label, rows = touched clusters only),
  * and one narrow rewrite of the (id, component) table — two longs
  * per admitted doc, the unavoidable persistence floor. At a scale
  * where even that rewrite hurts, the remap tables can instead be
  * APPENDED as label patches and composed at read (labels are
  * monotone decreasing, so patch composition is a min-fold); the
  * rewrite form is chosen here because it keeps reads free.
  */
object ClusterLedger {

  val NBuckets = 16

  /** Create the empty label table. */
  def init(spark: SparkSession, ledgerTable: String): Unit = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("id", "component")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(NBuckets, "id").sortBy("id")
      .saveAsTable(ledgerTable)
  }

  /** Pure delta update: `oldLabels` (a valid min-label components
    * table of everything admitted so far), this batch's `newIds`
    * (one `id` column — every admitted doc, paired or not) and the
    * batch's `deltaEdges` (src, dst) → the updated labels for
    * prior ∪ new docs.
    */
  def updatedLabels(oldLabels: DataFrame, newIds: DataFrame,
      deltaEdges: DataFrame): DataFrame = {
    val l = oldLabels.select(col("id"), col("component"))
    // collapse endpoints to super-nodes: a doc's current component if
    // previously admitted, itself if new this batch
    val superEdges = deltaEdges
      .join(l.select(col("id").as("src"), col("component").as("sc")),
        Seq("src"), "left")
      .join(l.select(col("id").as("dst"), col("component").as("dc")),
        Seq("dst"), "left")
      .select(coalesce(col("sc"), col("src")).as("src"),
        coalesce(col("dc"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    // delta-sized CC; its (super-node -> merged min) rows are the only
    // remap state — broadcast-joined below so the corpus-sized sides
    // never exchange
    val merged = GraphOps.connectedComponents(superEdges)
    val relabeledOld = l
      .join(broadcast(merged.select(col("id").as("component"),
        col("component").as("c2"))), Seq("component"), "left")
      .select(col("id"), coalesce(col("c2"), col("component")).as("component"))
    val newLabeled = newIds.select(col("id"))
      .join(broadcast(merged), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
    relabeledOld.unionByName(newLabeled)
  }

  /** Fold one batch into the persistent table: materialize the updated
    * labels BEFORE overwriting (the plan reads the table it replaces),
    * then swap. Returns the updated labels (reading the materialized
    * parquet, valid after the swap).
    */
  def ingest(spark: SparkSession, newIds: DataFrame, deltaEdges: DataFrame,
      ledgerTable: String, tmpDir: String): DataFrame = {
    updatedLabels(spark.table(ledgerTable), newIds, deltaEdges)
      .write.mode(SaveMode.Overwrite).parquet(tmpDir)
    spark.read.parquet(tmpDir)
      .select("id", "component")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(NBuckets, "id").sortBy("id")
      .saveAsTable(ledgerTable)
    spark.read.parquet(tmpDir)
  }
}
