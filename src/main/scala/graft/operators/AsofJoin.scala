package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join operator (no native Spark equivalent): for each
  * left row, the single most recent right row with
  * rightTime <= leftTime (backward direction) or the earliest with
  * rightTime >= leftTime (forward), matching on an equi key. Composed
  * from existing operators per SURVEY §4.2's preference order: equi
  * join on the key carries the shuffle, the inequality is a residual
  * predicate, and a per-left-row window keeps exactly one match —
  * deterministic via the caller-supplied tie-break column.
  *
  * Scale: the join fans out to |left| × (right rows per key) before the
  * window prunes it, so keys must bound their right-side history — true
  * for per-user event/order streams. For unbounded histories, bucket
  * rightTime into coarse time bands and add the band to the key first.
  */
object AsofJoin {

  /** leftId must uniquely identify left rows (the window partitions on
    * it). Keeps left columns plus the matched right columns; inner
    * semantics (unmatched left rows drop).
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String, rightTieBreak: String): DataFrame = {
    val joined = left.join(right,
      left(leftKey) === right(rightKey) && right(rightTime) <= left(leftTime))
    val w = Window.partitionBy(left(leftId))
      .orderBy(right(rightTime).desc, right(rightTieBreak).desc)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Backward as-of by union-merge — the no-fan-out form. Instead of
    * join-then-prune (|left| × per-key right history intermediate
    * rows), both sides union into one stream tagged by side, one
    * window per key sorts by (time, side, tie-break) and a running
    * `last(…, ignoreNulls)` carries the most recent right row forward
    * onto each left row. Cost: ONE shuffle on the key and one sort of
    * |left| + |right| rows — the intermediate never exceeds the input,
    * whatever the history length. Right rows sort before left rows at
    * equal times (inclusive rightTime <= leftTime), and ascending
    * tie-break makes the LAST same-time right row the winner, matching
    * asofBackward's (rightTime DESC, tieBreak DESC) row_number()=1.
    *
    * Returns left keys/id/time plus the matched right time and
    * tie-break column; inner semantics (unmatched left rows drop).
    */
  def asofBackwardUnion(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String, rightTieBreak: String): DataFrame = {
    val l = left.select(
      col(leftKey).as("__key"), col(leftTime).as("__time"),
      lit(1).as("__side"), col(leftId).as("__left_id"),
      lit(null).cast(right.schema(rightTieBreak).dataType).as("__r_tie"),
      lit(null).cast(right.schema(rightTime).dataType).as("__r_time"))
    val r = right.select(
      col(rightKey).as("__key"), col(rightTime).as("__time"),
      lit(0).as("__side"), lit(null).cast(left.schema(leftId).dataType).as("__left_id"),
      col(rightTieBreak).as("__r_tie"), col(rightTime).as("__r_time"))
    val w = Window.partitionBy("__key")
      .orderBy(col("__time").asc, col("__side").asc, col("__r_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m_tie", last(col("__r_tie"), ignoreNulls = true).over(w))
      .withColumn("__m_time", last(col("__r_time"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m_tie").isNotNull)
      .select(col("__key").as(leftKey), col("__left_id").as(leftId),
        col("__time").as(leftTime),
        col("__m_tie").as(rightTieBreak), col("__m_time").as(rightTime))
  }

  /** Backward as-of with a bounded lookback: only right rows with
    * leftTime − tolerance < rightTime <= leftTime can match. This is the
    * unbounded-history mitigation the plain variant's doc describes —
    * the tolerance doubles as the time band: both sides key on
    * (equi key, floor(time / tolerance)), the left side probing its own
    * band and the previous one (any in-tolerance right row lands in one
    * of those two). Join fan-out per left row is bounded by the right
    * rows in two bands of one key, however long the key's total history
    * — pandas merge_asof(tolerance=…) semantics at shuffle scale.
    *
    * Time columns must be numeric (unix micros, days, …); the caller
    * picks the unit and a tolerance in that unit.
    */
  def asofBackwardBanded(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String, rightTieBreak: String,
      tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val l = left
      .withColumn("__lband",
        explode(array(floor(col(leftTime) / tolerance),
          floor(col(leftTime) / tolerance) - 1)))
    val r = right.withColumn("__rband", floor(col(rightTime) / tolerance))
    val joined = l.join(r,
      l(leftKey) === r(rightKey) && l("__lband") === r("__rband") &&
        r(rightTime) <= l(leftTime) &&
        r(rightTime) > l(leftTime) - tolerance)
    val w = Window.partitionBy(l(leftId))
      .orderBy(r(rightTime).desc, r(rightTieBreak).desc)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__lband", "__rband")
  }

  def asofForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String, rightTieBreak: String): DataFrame = {
    val joined = left.join(right,
      left(leftKey) === right(rightKey) && right(rightTime) >= left(leftTime))
    val w = Window.partitionBy(left(leftId))
      .orderBy(right(rightTime).asc, right(rightTieBreak).asc)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
