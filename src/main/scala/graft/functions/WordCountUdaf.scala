package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's `reducef` plugin surface
  * (`/root/reference/main/mrworker.go:45-49`: `Reduce(key, values)
  * → string`, applied per group at `mr/worker.go:204`) recreated as a
  * typed Spark `Aggregator`. The wc reduce counts its values
  * (`mrapps/wc.go:39-42`) — here as an explicit IN→BUF→OUT fold with a
  * commutative/associative merge, which is what makes it safe for
  * partial aggregation on the map side (the combiner the reference
  * lacks) and for AQE-split partitions at any scale.
  */
object CountOccurrences extends Aggregator[String, Long, Long] {
  def zero: Long = 0L
  def reduce(buf: Long, in: String): Long = buf + 1L
  def merge(b1: Long, b2: Long): Long = b1 + b2
  def finish(buf: Long): Long = buf
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
