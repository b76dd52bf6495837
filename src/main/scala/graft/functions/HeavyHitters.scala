package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed, mergeable
  * `Aggregator` — the frequency analogue of the HLL/GK sketches in
  * StatsQueries. The reference's wc app (`/root/reference/mrapps/
  * wc.go:21-42`) ships EVERY token occurrence through the shuffle to
  * count it; at 100 TB the interesting question is usually only "which
  * tokens are frequent", and that answer fits in O(k) space per task.
  *
  * Guarantees (Misra-Gries 1982; merge form per Agarwal et al.,
  * "Mergeable Summaries", PODS'12):
  *  - the summary holds at most `k` entries;
  *  - every item with true frequency > n/(k+1) is present (no false
  *    negatives above that bar);
  *  - each stored estimate undercounts by at most n/(k+1).
  *
  * The summary's CONTENTS depend on partition/merge order (like any
  * MG), so query surfaces must not expose raw estimates as a
  * deterministic result — `AnalyticsQueries.qHeavyHitters` uses the
  * candidate set only as a no-false-negative prune and confirms with
  * exact counts, which makes the final answer exact and
  * order-independent (the same prune-then-confirm move as
  * `q_decontaminate_bloom`).
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]]
    with Serializable {
  require(k > 0, "k must be positive")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // classic MG decrement: one counter from every entry and the
        // unstored item cancel out; drop exhausted entries
        buf.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed =
      b.foldLeft(a) { case (acc, (t, c)) => acc.updated(t, acc.getOrElse(t, 0L) + c) }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything; at most k
      // entries stay positive and the total undercount stays ≤ n/(k+1)
      val d = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      summed.flatMap { case (t, c) => if (c > d) Some(t -> (c - d)) else None }
    }
  }

  def finish(buf: Map[String, Long]): Seq[String] = buf.keys.toSeq.sorted

  def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
