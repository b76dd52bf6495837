package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Exactly-once across restarts: the reference's crash/jobcount tests
  * assert that re-executed work leaves no duplicate output. The
  * streaming analogue is stronger — kill the whole query between
  * batches and resume from the checkpoint: the parquet sink's commit
  * log plus the checkpointed source offsets must yield exactly the
  * rows a single uninterrupted run would have produced, no dupes, no
  * gaps.
  */
class StreamingRestartSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("parquet sink + checkpoint resume is exactly-once across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("restart_in_").toString
    val out = Files.createTempDirectory("restart_out_").toString
    val ckpt = Files.createTempDirectory("restart_ckpt_").toString

    // unique event_id gives the two limit() evaluations a deterministic
    // identical split (ts alone has ties)
    val events = Tables.events(spark, sfDir).orderBy("event_id")
    val n = events.count()
    val half = (n / 2).toInt

    // first half arrives; run 1 processes it and STOPS (simulated crash
    // boundary: AvailableNow drains then terminates)
    events.limit(half).coalesce(1).write.mode("append").parquet(in)
    def stream() = EventStreams.fileSource(spark, in, maxFilesPerTrigger = 1)
      .select("event_id", "ts", "user_id", "event_type", "value")
    EventStreams.runToParquet(stream(), out, ckpt)
    val afterRun1 = spark.read.parquet(out).count()
    assert(afterRun1 > 0 && afterRun1 <= half)

    // second half arrives; run 2 resumes from the checkpoint — it must
    // pick up ONLY what run 1 never committed
    events.exceptAll(events.limit(half)).coalesce(1)
      .write.mode("append").parquet(in)
    EventStreams.runToParquet(stream(), out, ckpt)

    val streamed = spark.read.parquet(out)
    assert(streamed.count() == n, s"expected $n rows, got ${streamed.count()}")
    assert(streamed.select("event_id").distinct().count() == n,
      "restart duplicated rows")
    val batch = events.select("event_id", "ts", "user_id", "event_type", "value")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "restarted stream diverged from the batch content")
  }
}
