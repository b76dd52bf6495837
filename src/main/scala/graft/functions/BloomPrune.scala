package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
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
  * Keys are probed through `xxhash64`, matching the runtime filter's
  * own hashing; false positives are removed by the exact join/confirm
  * that always follows a Bloom prune. xxhash64 is TYPE-sensitive:
  * INT 5 and BIGINT 5 hash to different values, so a width mismatch
  * between build and probe keys would silently drop TRUE matches — a
  * false-NEGATIVE correctness failure, not an fpp trade. `bloomBinary`
  * therefore resolves the build key's type and fixes a canonical form
  * (all integral widths widen to long; other types keep their own),
  * carried in the returned [[BloomModel]]; `mightContain` casts the
  * probe key to that same form, so both sides always hash identical
  * bytes regardless of the columns' declared widths.
  */
object BloomPrune {

  /** A built filter binary plus the canonical type both sides hash
    * through. The cast is a no-op (removed by Catalyst) when the key
    * already has the canonical type.
    */
  final case class BloomModel(bytes: Array[Byte], castTo: DataType)

  private def canonicalType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case other => other
  }

  /** Build the filter binary from `df`'s `key` column (one aggregate,
    * one driver-side binary). `expectedItems` sizes the filter; `fpp`
    * sets the bits via the standard optimal-bits formula.
    */
  def bloomBinary(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): BloomModel = {
    val target = canonicalType(df.select(key.as("k")).schema.head.dataType)
    val n = math.max(expectedItems, 1000L)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key.cast(target))),
      org.apache.spark.sql.catalyst.expressions.Literal(n),
      org.apache.spark.sql.catalyst.expressions.Literal(
        BloomFilter.optimalNumOfBits(n, fpp)))
      .toAggregateExpression()
    BloomModel(
      df.select(ColumnBridge.column(agg).as("bf"))
        .head().getAs[Array[Byte]](0),
      target)
  }

  /** Codegen'd membership probe:
    * might_contain(filter, xxhash64(cast(key))).
    */
  def mightContain(model: BloomModel, key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(model.bytes)),
      ColumnBridge.expression(xxhash64(key.cast(model.castTo)))))
}
