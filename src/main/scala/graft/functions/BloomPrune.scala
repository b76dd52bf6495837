package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom semi-join reduction on Spark's NATIVE Catalyst expressions —
  * the same `BloomFilterAggregate` / `BloomFilterMightContain` pair
  * the engine's runtime row-level filter injects
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), driven
  * explicitly. Replaces the earlier Scala-UDF prune: the membership
  * probe codegens inside the scan's WholeStageCodegen span (the
  * deserialized filter is cached once per task by the expression's
  * own codegen), instead of crossing a ScalaUDF boundary per row.
  *
  * The filter is built by ONE executor-side aggregate over the keyed
  * frame and lands on the driver as a single binary value (the model —
  * fixed-size, ~1.2 MB per million keys at 1% fpp), then re-enters the
  * probe side as a foldable literal: `BloomFilterMightContain`
  * requires its filter input be a constant or scalar subquery, and a
  * literal also survives plan reuse. One driver action total (the old
  * UDF form paid a `count()` plus `stat.bloomFilter`'s separate
  * aggregate).
  *
  * Keys are probed through `xxhash64` on both sides, matching the
  * runtime filter's own hashing; false positives are removed by the
  * exact join/confirm that always follows a Bloom prune.
  */
object BloomPrune {

  /** Build the filter binary from `df`'s `key` column (one aggregate,
    * one driver-side binary). `expectedItems` sizes the filter; `fpp`
    * sets the bits via the standard optimal-bits formula.
    */
  def bloomBinary(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(expectedItems, 1000L)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      org.apache.spark.sql.catalyst.expressions.Literal(n),
      org.apache.spark.sql.catalyst.expressions.Literal(
        BloomFilter.optimalNumOfBits(n, fpp)))
      .toAggregateExpression()
    df.select(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe: might_contain(filter, xxhash64(key)). */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(filterBytes)),
      ColumnBridge.expression(xxhash64(key))))
}
