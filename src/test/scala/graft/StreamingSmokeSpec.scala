package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** streaming_smoke (SURVEY.md §2.3, no-oracle): replay the events table
  * as a file-source stream and check watermarked append-mode windowing
  * against the batch plan on identical data, plus the stateful
  * mapGroupsWithState surface.
  */
class StreamingSmokeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val inputDir: String = {
    val dir = Files.createTempDirectory("events_stream_").toString
    // Replay in 8 time-ordered chunks (one file each, ascending mtime) so
    // micro-batches arrive in event-time order: the watermark advances
    // between batches but nothing is ever late by more than the 10-minute
    // delay, so streamed counts must equal batch counts exactly.
    val events = Tables.events(spark, sfDir)
    val r = events.agg(
      min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val lo: Long = r.getLong(0)
    val hi: Long = r.getLong(1)
    val step: Long = (hi - lo) / 8 + 1
    for (i <- 0 until 8) {
      events.filter(
        unix_micros(col("ts")) >= lo + i * step &&
          unix_micros(col("ts")) < lo + (i + 1) * step)
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(30)
    }
    dir
  }

  test("streaming tumbling windows match the batch result below the watermark") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.tumblingCounts(EventStreams.fileSource(spark, inputDir)),
      "tumbling_smoke", OutputMode.Append())
    val streamed = spark.table("tumbling_smoke")

    val batch = SparkEntry.queries("q_stream_tumbling")(spark, sfDir)
    val maxTs = Tables.events(spark, sfDir).agg(max($"ts")).head().getTimestamp(0)
    val watermarkUs = maxTs.getTime * 1000L - 10L * 60 * 1000000

    // every emitted row equals its batch twin
    val batchKeyed = batch.withColumnRenamed("n_events", "b_n")
      .withColumnRenamed("sum_value", "b_sum")
    val joined = streamed.join(batchKeyed, Seq("window_start", "event_type"))
    assert(joined.count() == streamed.count(), "streamed row missing from batch")
    assert(joined.filter($"n_events" =!= $"b_n" || $"sum_value" =!= $"b_sum").count() == 0)

    // and every window fully below the final watermark was emitted
    val expectedClosed = batch.filter(
      (unix_micros($"window_start") + 3600L * 1000000L) < watermarkUs).count()
    assert(streamed.count() >= expectedClosed,
      s"expected at least $expectedClosed closed windows, got ${streamed.count()}")
    assert(streamed.count() > 0)
  }

  test("streaming dedup emits at most one row per key within the watermark") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.dedupWithinWatermark(EventStreams.fileSource(spark, inputDir)),
      "dedup_smoke", OutputMode.Append())
    val out = spark.table("dedup_smoke")
    assert(out.count() > 0)
    // no (user, type) appears twice within any 10-minute span
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy($"ts")
    val tooClose = out
      .withColumn("prev", lag(unix_micros($"ts"), 1).over(w))
      .filter($"prev".isNotNull &&
        unix_micros($"ts") - $"prev" < 10L * 60 * 1000000)
      .count()
    assert(tooClose == 0)
    assert(out.select("user_id", "event_type").distinct().count() ==
      Tables.events(spark, sfDir).select("user_id", "event_type").distinct().count())
  }

  test("streaming sessionizer emits exactly the batch sessions it closes") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.sessionize(spark, EventStreams.fileSource(spark, inputDir)).toDF(),
      "session_smoke", OutputMode.Append())
    val streamed = spark.table("session_smoke")
      .select($"user_id",
        $"session_start_us".as("start_us"),
        $"session_end_us".as("end_us"),
        $"n_events")
    assert(streamed.count() > 0)
    val batch = SparkEntry.queries("q_session_window")(spark, sfDir)
      .select($"user_id",
        unix_micros($"session_start").as("start_us"),
        unix_micros($"session_end").as("end_us"),
        $"n_events")
    // every streamed session is exactly one batch session
    assert(streamed.exceptAll(batch).count() == 0,
      "streaming emitted a session the batch algebra does not contain")
    // and no session was emitted twice
    assert(streamed.distinct().count() == streamed.count())
  }

  test("vec_dot is callable from SQL via GraftExtensions") {
    import spark.implicits._
    val r = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }

  test("stateful running counts converge to per-user totals") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.runningUserCounts(spark,
        EventStreams.fileSource(spark, inputDir)).toDF(),
      "user_counts_smoke", OutputMode.Update())
    // update mode: last emission per user is the final state
    val finalCounts = spark.table("user_counts_smoke")
      .groupBy("user_id").agg(max($"n_events").as("n_events"))
    val expected = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("expected"))
    val bad = finalCounts.join(expected, "user_id")
      .filter($"n_events" =!= $"expected").count()
    assert(bad == 0)
    assert(finalCounts.count() == expected.count())
  }
}
