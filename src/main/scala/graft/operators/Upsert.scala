package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert + delete) over immutable parquet snapshots — the
  * corpus-maintenance operator an incremental training-data pipeline
  * needs next to the append-only DedupLedger: apply a change batch to
  * the current snapshot, produce the NEXT snapshot in a new directory,
  * never in place (a failed merge leaves the current snapshot intact;
  * the caller flips a pointer — the same exactly-once publication
  * pattern the ledger and the streaming file sink use).
  *
  * Semantics per key, SQL MERGE-shaped:
  *   - key in batch with `_deleted` = true  → key dropped
  *   - key in batch, `_deleted` false/absent → batch row replaces target
  *   - key only in target                    → target row carried over
  *
  * Scale: ONE full-outer shuffle on the key; cost ∝ |snapshot| + |batch|
  * regardless of history depth. The batch side is typically tiny — AQE
  * turns the join into broadcast at runtime when it is.
  */
object Upsert {

  /** The merge as a pure transform: `updates` must contain `target`'s
    * columns (plus an optional boolean `_deleted`) and AT MOST ONE ROW
    * PER KEY — SQL MERGE raises on multiple matches, and so does this
    * (a full-outer join would otherwise fan the duplicate out into a
    * silently corrupted snapshot). The check rides the plan itself:
    * a count-over-window on the batch's key partition feeds
    * assert_true, so a duplicate fails the job at execution with the
    * offending key named, costing no extra action and no driver
    * round-trip; the window's exchange is on the same key the join
    * shuffles anyway.
    */
  def mergeFrames(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = target.columns
    require(cols.contains(key), s"target lacks key column $key")
    val withTombstone =
      if (updates.columns.contains("_deleted")) updates
      else updates.withColumn("_deleted", lit(false))
    val t = target.select(col(key).as("__k"),
      struct(cols.map(col).toIndexedSeq: _*).as("__t"))
    val u = withTombstone.select(col(key).as("__k"),
      struct(cols.map(col).toIndexedSeq: _*).as("__u"), col("_deleted"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__k")))
      .filter(assert_true(col("__n") === 1,
        concat(lit("duplicate key in merge batch: "),
          col("__k").cast("string"))).isNull)
      .drop("__n")
    t.join(u, Seq("__k"), "full_outer")
      .filter(col("_deleted").isNull || !col("_deleted"))
      .select(coalesce(col("__u"), col("__t")).as("__r"))
      .select(cols.map(c => col(s"__r.`$c`").as(c)).toIndexedSeq: _*)
  }

  /** Apply the merge and publish the next snapshot at `outDir`. */
  def merge(target: DataFrame, updates: DataFrame, key: String,
      outDir: String): Unit =
    mergeFrames(target, updates, key)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
}
