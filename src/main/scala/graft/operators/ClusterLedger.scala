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
  * == Two persistence modes ==
  *
  * REWRITE mode ([[init]]/[[ingest]]): one narrow rewrite of the
  * (id, component) table per batch — two longs per admitted doc.
  * Reads are free (the table IS the answer), but per-batch write
  * volume is corpus-linear: at billions of docs the rewrite dominates.
  *
  * PATCH-APPEND mode ([[initPatch]]/[[ingestPatch]]/[[resolvePatch]]):
  * per-batch writes are proportional to the DELTA. The base label
  * table is APPEND-ONLY — each batch appends its new docs labeled as
  * of admission — and merges land in a separate, fully-resolved
  * `<table>_patch` map (stale label → current label). Because labels
  * are monotone decreasing and a stale label can never become current
  * again (a cluster's label is its min member id; once remapped to a
  * smaller min, the old min's cluster contains that smaller id
  * forever), the patch map composes by a single substitution pass per
  * batch — no chains survive — and a read resolves with ONE
  * broadcast-join: `coalesce(patch[component], component)`.
  * Per-batch write = |delta| appended labels + the (touched-clusters-
  * sized) patch rewrite; measured against rewrite mode in SCALING.md.
  * ClusterLedgerSpec proves both modes resolve to identical labels
  * through the real MinHashLedger batch flow.
  *
  * Retry-safe (both modes): MinHashLedger blesses blind re-append for
  * a crashed-then-retried batch, and the composed pipeline forwards
  * the same batch here — so `newIds` is anti-joined against the
  * already-admitted ids before labeling. Without that, a retried doc
  * would emit a SECOND self-labeled row (`coalesce(component, id)`)
  * conflicting with its already-merged label. Retried deltaEdges are
  * harmless either way (their endpoints collapse to the super-nodes
  * they already merged into, a no-op CC).
  */
object ClusterLedger {

  val NBuckets = 16

  /** Drop metadata AND any stale physical location from a previous JVM
    * (in-memory catalog forgets the table, the warehouse dir persists,
    * and CREATE then fails with LOCATION_ALREADY_EXISTS).
    */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Create the empty label table (rewrite mode). */
  def init(spark: SparkSession, ledgerTable: String): Unit = {
    import spark.implicits._
    dropWithLocation(spark, ledgerTable)
    Seq.empty[(Long, Long)].toDF("id", "component")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(NBuckets, "id").sortBy("id")
      .saveAsTable(ledgerTable)
  }

  /** The delta-sized remap: collapse delta-edge endpoints to their
    * current cluster labels (super-nodes), run CC on that collapsed
    * graph, return (old label → merged min label) rows for every
    * touched super-node. Bounded by the delta (≤ 2 super-nodes per
    * delta edge) — this is the only state a batch's merges produce.
    */
  private def mergeRemap(currentLabels: DataFrame,
      deltaEdges: DataFrame): DataFrame = {
    val l = currentLabels.select(col("id"), col("component"))
    val superEdges = deltaEdges
      .join(l.select(col("id").as("src"), col("component").as("sc")),
        Seq("src"), "left")
      .join(l.select(col("id").as("dst"), col("component").as("dc")),
        Seq("dst"), "left")
      .select(coalesce(col("sc"), col("src")).as("src"),
        coalesce(col("dc"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    GraphOps.connectedComponents(superEdges)
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
    // delta-sized CC; its (super-node -> merged min) rows are the only
    // remap state — broadcast-joined below so the corpus-sized sides
    // never exchange
    val merged = mergeRemap(l, deltaEdges)
    val relabeledOld = l
      .join(broadcast(merged.select(col("id").as("component"),
        col("component").as("c2"))), Seq("component"), "left")
      .select(col("id"), coalesce(col("c2"), col("component")).as("component"))
    val newLabeled = newIds.select(col("id"))
      .join(l.select("id"), Seq("id"), "left_anti")
      .join(broadcast(merged), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
    relabeledOld.unionByName(newLabeled)
  }

  /** Fold one batch into the persistent table (rewrite mode):
    * materialize the updated labels BEFORE overwriting (the plan reads
    * the table it replaces), then swap. Returns the updated labels
    * (reading the materialized parquet, valid after the swap).
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

  // ---------------- patch-append mode ----------------

  /** Create the empty append-only base table + empty patch map. */
  def initPatch(spark: SparkSession, ledgerTable: String): Unit = {
    import spark.implicits._
    dropWithLocation(spark, ledgerTable)
    dropWithLocation(spark, patchTable(ledgerTable))
    Seq.empty[(Long, Long)].toDF("id", "component")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(NBuckets, "id").sortBy("id")
      .saveAsTable(ledgerTable)
    Seq.empty[(Long, Long)].toDF("from_label", "to_label")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(patchTable(ledgerTable))
  }

  private def patchTable(ledgerTable: String): String = s"${ledgerTable}_patch"

  /** The resolved labels view: base (as-of-admission labels) composed
    * with the fully-resolved patch map in ONE broadcast join. This is
    * the read path patch mode trades its cheap writes for — still a
    * single narrow join, never an iteration (the patch map has no
    * chains by construction, see the class doc).
    *
    * Both tables are refreshed before planning: the patch map is
    * OVERWRITTEN every fold, and a caller whose session did not do
    * the last write — Structured Streaming's foreachBatch runs in a
    * CLONED session per query, so alternating streamed and manual
    * folds is exactly this — can hold a stale cached file listing and
    * die with FILE_NOT_EXIST mid-scan (caught by the
    * compact-interleave replay in StreamingLedgerSpec). The refresh
    * re-lists two delta-sized directories; negligible next to the
    * fold.
    */
  def resolvePatch(spark: SparkSession, ledgerTable: String): DataFrame = {
    spark.catalog.refreshTable(ledgerTable)
    spark.catalog.refreshTable(patchTable(ledgerTable))
    spark.table(ledgerTable)
      .join(broadcast(spark.table(patchTable(ledgerTable))
        .withColumnRenamed("from_label", "component")),
        Seq("component"), "left")
      .select(col("id"),
        coalesce(col("to_label"), col("component")).as("component"))
  }

  /** Fold one batch in patch-append mode. Writes: the batch's
    * first-time ids labeled as of admission (APPEND, delta-sized) and
    * the substituted patch map (overwrite of a touched-clusters-sized
    * side table). The corpus-sized base table is never rewritten.
    * Returns the resolved labels after the fold.
    */
  def ingestPatch(spark: SparkSession, newIds: DataFrame,
      deltaEdges: DataFrame, ledgerTable: String, tmpDir: String): DataFrame =
    ingestPatchImpl(spark, newIds, deltaEdges, ledgerTable,
      (df, name) => {
        df.write.mode(SaveMode.Overwrite).parquet(s"$tmpDir/$name")
        spark.read.parquet(s"$tmpDir/$name")
      })

  /** Patch-mode fold whose intermediates live in executor storage
    * (eager localCheckpoints) instead of caller-owned parquet dirs —
    * the query-surface form: same fold, nothing written outside the
    * ledger tables, nothing leaked when the tables drop. The durable
    * [[ingestPatch]] keeps the tmpDir contract for pipelines that want
    * the delta remap and new labels as restartable artifacts.
    */
  def ingestPatchEphemeral(spark: SparkSession, newIds: DataFrame,
      deltaEdges: DataFrame, ledgerTable: String): DataFrame =
    ingestPatchImpl(spark, newIds, deltaEdges, ledgerTable,
      (df, _) => df.localCheckpoint(true))

  /** The fold body; `materialize(df, name)` must return an EAGERLY
    * computed stand-in for `df` that stays valid after the ledger
    * tables it reads are overwritten/appended.
    */
  private def ingestPatchImpl(spark: SparkSession, newIds: DataFrame,
      deltaEdges: DataFrame, ledgerTable: String,
      materialize: (DataFrame, String) => DataFrame): DataFrame = {
    val resolved = resolvePatch(spark, ledgerTable)
    // materialize the delta remap BEFORE touching the patch table (the
    // resolve plan reads it); delta-sized
    val m = materialize(
      mergeRemap(resolved, deltaEdges)
        .select(col("id").as("from_label"), col("component").as("to_label"))
        .filter(col("from_label") =!= col("to_label")),
      "merged")
    // the patch map records only OLD cluster labels that moved: a
    // remap entry keyed by one of this batch's first-time ids is
    // served by the base append below (the doc lands already-merged),
    // and keeping it out is what makes the patch grow with TOUCHED
    // CLUSTERS rather than with admitted docs. First-time ids and old
    // labels are disjoint (labels are previously-admitted doc ids), so
    // the anti-join drops nothing a read could ever need.
    val firstTime = newIds.select(col("id"))
      .join(spark.table(ledgerTable).select("id"), Seq("id"), "left_anti")
    val mOld = m.join(firstTime.withColumnRenamed("id", "from_label"),
      Seq("from_label"), "left_anti")
    // one substitution pass keeps the map fully resolved: existing
    // entries pointing at a label this batch re-merged follow it to
    // the new min; no chains can survive, so reads stay one join
    val composed = materialize(
      spark.table(patchTable(ledgerTable))
        .join(broadcast(mOld.select(col("from_label").as("to_label"),
          col("to_label").as("to2"))),
          Seq("to_label"), "left")
        .select(col("from_label"),
          coalesce(col("to2"), col("to_label")).as("to_label"))
        .unionByName(mOld),
      "patch")
    composed
      .select("from_label", "to_label")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(patchTable(ledgerTable))
    // first-time admissions, labeled as of NOW (post-merge). A new
    // doc's super-node id IS itself (never previously admitted), so
    // the m join lands its merged min; unpaired docs self-label.
    // Materialized before the append — the plan anti-joins the table
    // it inserts into.
    materialize(
      firstTime
        .join(broadcast(m.withColumnRenamed("from_label", "id")), Seq("id"),
          "left")
        .select(col("id"),
          coalesce(col("to_label"), col("id")).as("component")),
      "new_labels")
      .select("id", "component")
      .write.mode(SaveMode.Append).insertInto(ledgerTable)
    resolvePatch(spark, ledgerTable)
  }

  /** Fold the patch map into the base table and truncate it — patch
    * mode's LSM amortization, the counterpart of MinHashLedger.compact:
    * per-batch folds keep writes delta-sized, but the read-side
    * contract (ONE broadcast join) only holds while the patch map
    * stays broadcast-small, and it grows with touched clusters across
    * the whole history. A periodic checkpoint rewrites the base with
    * every patch applied (one corpus-sized write, amortized over many
    * delta-sized batches) and empties the map — resolved labels are
    * bit-identical before and after (resolvePatch over an empty map IS
    * the base), proven in ClusterLedgerSpec, which also folds further
    * batches on top of a checkpoint. Maintenance cost is priced
    * separately from per-batch folds, exactly like compact vs probe in
    * SCALING.md's band-ledger section.
    */
  def checkpointPatch(spark: SparkSession, ledgerTable: String,
      tmpDir: String): Unit = {
    import spark.implicits._
    // materialize the resolve BEFORE overwriting the tables it reads
    resolvePatch(spark, ledgerTable)
      .write.mode(SaveMode.Overwrite).parquet(tmpDir)
    spark.read.parquet(tmpDir)
      .select("id", "component")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(NBuckets, "id").sortBy("id")
      .saveAsTable(ledgerTable)
    Seq.empty[(Long, Long)].toDF("from_label", "to_label")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(patchTable(ledgerTable))
  }

  /** The incremental CLUSTER flow as an ORACLE-CHECKED query — the
    * composed pipeline q_dedup_incremental feeds: the same bounded
    * universe (doc_id % 5 == 0, ≥1 token) ingested in the same three
    * modulo batches, each batch's MinHashLedger candidate pairs folded
    * into a patch-append cluster ledger as its delta edges, every
    * admitted doc labeled. The final resolved table is the min-label
    * connected components of the union of per-batch pairs — by the
    * append-monotone theorem, of the ONE-SHOT banded-LSH pair set —
    * which the DuckDB oracle replays directly (same salted-md5
    * signatures, recursive-CTE reachability, unpaired docs
    * self-labeled), so incremental-fold ≡ full-recompute is
    * hash-checked by the driver, not just spec-asserted
    * (ClusterLedgerSpec proves the same equality through ingest-mode
    * folds).
    *
    * Everything ephemeral: band + label + patch tables are throwaway
    * UUIDs dropped in the finally, intermediates are eager
    * localCheckpoints — no caller-owned dirs, nothing leaked.
    */
  def qDedupIncrClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = MinHashLedger.incrUniverse(spark, sfDir)
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "")
    val bandTable = s"q_incr_cl_band_$suffix"
    val labelTable = s"q_incr_cl_lab_$suffix"
    MinHashLedger.init(spark, bandTable)
    initPatch(spark, labelTable)
    try {
      (0 until 3).foreach { b =>
        val batch = docs.filter(pmod(col("doc_id"), lit(3)) === b)
        val bands = MinHashLedger.bandRows(batch).localCheckpoint(false)
        // this batch's pairs are fixed BEFORE its band rows land
        val pairs = MinHashLedger.candidatesFromBands(spark, bands,
          bandTable, MinHashLsh.BucketCap).localCheckpoint(true)
        MinHashLedger.writeSorted(bands, bandTable, SaveMode.Append)
        ingestPatchEphemeral(spark,
          batch.select(col("doc_id").as("id")),
          pairs.select(col("doc_id_1").as("src"), col("doc_id_2").as("dst")),
          labelTable)
      }
      // materialize the final resolve before the finally drops the
      // tables the lazy plan would otherwise re-read
      resolvePatch(spark, labelTable).orderBy("id").localCheckpoint(true)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $bandTable")
      spark.sql(s"DROP TABLE IF EXISTS $labelTable")
      spark.sql(s"DROP TABLE IF EXISTS ${patchTable(labelTable)}")
    }
  }
}
