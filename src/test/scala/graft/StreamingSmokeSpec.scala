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

  test("stream-static enrichment join matches the batch per-tier counts") {
    import spark.implicits._
    val tiers = Tables.events(spark, sfDir).select($"user_id").distinct()
      .select($"user_id", (pmod($"user_id", lit(3))).cast("int").as("tier"))
    EventStreams.runToMemory(
      EventStreams.enrichedTierCounts(
        EventStreams.fileSource(spark, inputDir), tiers),
      "enrich_smoke", OutputMode.Append())
    val streamed = spark.table("enrich_smoke")
    assert(streamed.count() > 0)
    // every emitted (window, tier) row equals the batch recompute
    val batch = Tables.events(spark, sfDir)
      .join(tiers, Seq("user_id"))
      .groupBy(window($"ts", "1 hour"), $"tier")
      .agg(count(lit(1)).as("b_n"))
      .select($"window.start".as("window_start"), $"tier", $"b_n")
    val joined = streamed.join(batch, Seq("window_start", "tier"))
    assert(joined.count() == streamed.count(), "streamed row missing from batch")
    assert(joined.filter($"n_events" =!= $"b_n").count() == 0)
  }

  test("streaming sliding windows match the batch result below the watermark") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.slidingCounts(EventStreams.fileSource(spark, inputDir)),
      "sliding_smoke", OutputMode.Append())
    val streamed = spark.table("sliding_smoke")
    assert(streamed.count() > 0)
    val batch = SparkEntry.queries("q_stream_sliding")(spark, sfDir)
      .withColumnRenamed("n_events", "b_n")
    val joined = streamed.join(batch, Seq("window_start"))
    assert(joined.count() == streamed.count(),
      "streamed sliding window missing from batch")
    assert(joined.filter($"n_events" =!= $"b_n").count() == 0)
  }

  test("streaming as-of: latest click per purchase equals the batch banded as-of") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.purchaseClickPairs(EventStreams.fileSource(spark, inputDir)),
      "asof_pairs_smoke", OutputMode.Append())
    val pairs = spark.table("asof_pairs_smoke")
    assert(pairs.count() > 0)
    // reduce the interval-join candidates to the single latest click per
    // purchase — the same (c_ts desc, click_id desc) pick the batch
    // operator's window makes
    val w = org.apache.spark.sql.expressions.Window.partitionBy("purchase_id")
      .orderBy($"c_ts".desc, $"click_id".desc)
    val streamedAsof = pairs
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"purchase_id".as("event_id"), $"user_id", $"p_ts".as("ts"),
        $"click_id", $"c_ts".as("click_ts"))
    val batch = SparkEntry.queries("q_join_asof_banded")(spark, sfDir)
    assert(streamedAsof.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamedAsof).count() == 0,
      "streaming pairs reduced to latest-click must equal the batch as-of answer")
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

  test("stream-stream interval join emits exactly the batch attribution pairs") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.purchaseClickPairs(EventStreams.fileSource(spark, inputDir)),
      "pairs_smoke", OutputMode.Append())
    val streamed = spark.table("pairs_smoke").select("purchase_id", "click_id")
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("pu"), $"ts".as("p_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"), $"ts".as("c_ts"))
    val batch = p.join(c,
      $"pu" === $"cu" && $"c_ts" <= $"p_ts" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "click_id")
    assert(batch.count() > 0, "fixture lost its in-interval pairs")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "stream-stream join diverged from the batch interval join")
  }

  test("a row later than the watermark is dropped, its window is not re-emitted") {
    import spark.implicits._
    // Three files arriving in order: (1) three rows in hour-window W,
    // (2) one row 3 hours later — advances the watermark far past W's
    // end, closing and emitting W, (3) one LATE row back inside W,
    // beyond the 10-minute watermark delay. The reference's correctness
    // story is "wrong/duplicate data must not reach output": the late
    // row must neither bump W's emitted count nor re-emit W.
    val dir = Files.createTempDirectory("late_events_").toString
    val h0 = 1700000000000000L // micros, on an hour boundary? not needed
    def write(rows: Seq[(Long, Long)]): Unit = {
      rows.map { case (id, us) =>
        (id, new java.sql.Timestamp(us / 1000), 1L, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(30)
    }
    // Drive the batches explicitly (AvailableNow may coalesce files into
    // one batch, and the watermark only advances BETWEEN batches): each
    // processAllAvailable() is a completed batch, so batch 3 provably
    // runs with the watermark h0+3h−10min established by batch 2.
    val q = EventStreams
      .tumblingCounts(EventStreams.fileSource(spark, dir))
      .writeStream.format("memory").queryName("late_smoke")
      .outputMode(OutputMode.Append()).start()
    try {
      write(Seq((1L, h0), (2L, h0 + 60L * 1000000), (3L, h0 + 120L * 1000000)))
      q.processAllAvailable()
      write(Seq((4L, h0 + 3L * 3600 * 1000000)))
      q.processAllAvailable()
      write(Seq((5L, h0 + 180L * 1000000))) // late: far behind the watermark
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late_smoke").filter($"event_type" === "click")
    val firstWindow = out.filter(unix_micros($"window_start") <= h0)
      .select($"n_events".cast("long")).as[Long].collect()
    assert(firstWindow.length == 1,
      s"late row re-opened an emitted window: ${out.collect().mkString(", ")}")
    assert(firstWindow.head == 3L,
      s"late row leaked into the closed window count: got ${firstWindow.head}")
  }

  test("streaming funnel state machine converges to the batch funnel exactly") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.funnelState(spark,
        EventStreams.fileSource(spark, inputDir)).toDF(),
      "funnel_smoke", OutputMode.Update())
    // update mode: stage timestamps are set-once (monotone), so the max
    // over a user's emissions IS the final state, nulls ignored by max
    val streamed = spark.table("funnel_smoke")
      .groupBy("user_id")
      .agg(max($"t_view_us").as("s_view"), max($"t_click_us").as("s_click"),
        max($"t_purchase_us").as("s_purchase"), max($"depth").as("s_depth"))
    val batch = SparkEntry.queries("q_funnel")(spark, sfDir)
      .select($"user_id", unix_micros($"t_view").as("b_view"),
        unix_micros($"t_click").as("b_click"),
        unix_micros($"t_purchase").as("b_purchase"), $"depth".as("b_depth"))
    assert(batch.count() > 0 && streamed.count() == batch.count())
    val mism = streamed.join(batch, "user_id")
      .filter(!($"s_view" <=> $"b_view") || !($"s_click" <=> $"b_click") ||
        !($"s_purchase" <=> $"b_purchase") || $"s_depth" =!= $"b_depth")
      .count()
    assert(mism == 0, "streaming funnel diverged from batch funnel")
  }

  test("streaming ewma equals the sequential recursion on the ordered replay") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.ewmaState(spark,
        EventStreams.fileSource(spark, inputDir)).toDF(),
      "ewma_smoke", OutputMode.Update())
    val streamed = spark.table("ewma_smoke")
      .select($"event_id", $"ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // expected: fold the true recursion over each user's time-ordered
    // events (exactly what the state machine claims to compute)
    val alpha = operators.EventQueries.EwmaAlpha
    val rows = Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var prev = Option.empty[Double]
      es.sortBy(e => (e._2, e._3)).toSeq.map { case (_, _, id, v) =>
        val e = prev.fold(v)(p => alpha * v + (1.0 - alpha) * p)
        prev = Some(e)
        id -> math.rint(e * 1e6) / 1e6
      }
    }
    assert(streamed.size == rows.length, "one emission per event expected")
    val mism = expected.count { case (id, e) => streamed(id) != e }
    assert(mism == 0, s"$mism events diverge from the sequential recursion")
  }

  test("streaming holt equals the sequential level/trend fold on the ordered replay") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.holtState(spark,
        EventStreams.fileSource(spark, inputDir)).toDF(),
      "holt_smoke", OutputMode.Update())
    val streamed = spark.table("holt_smoke")
      .select($"event_id", $"level", $"trend", $"forecast").collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val (a, b) = (EventStreams.HoltAlpha, EventStreams.HoltBeta)
    val rows = Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var carry = Option.empty[(Double, Double)]
      es.sortBy(e => (e._2, e._3)).toSeq.map { case (_, _, id, v) =>
        val next = carry match {
          case Some((l, t)) =>
            val l2 = a * v + (1.0 - a) * (l + t)
            (l2, b * (l2 - l) + (1.0 - b) * t)
          case None => (v, 0.0)
        }
        carry = Some(next)
        id -> ((math.rint(next._1 * 1e6) / 1e6, math.rint(next._2 * 1e6) / 1e6,
          math.rint((next._1 + next._2) * 1e6) / 1e6))
      }
    }
    assert(streamed.size == rows.length, "one emission per event expected")
    val mism = expected.count { case (id, e) => streamed(id) != e }
    assert(mism == 0, s"$mism events diverge from the sequential Holt fold")
  }

  test("streaming cusum equals the sequential clamped fold on the ordered replay") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.cusumState(spark,
        EventStreams.fileSource(spark, inputDir)).toDF(),
      "cusum_smoke", OutputMode.Update())
    val streamed = spark.table("cusum_smoke")
      .select($"event_id", $"s_pos", $"s_neg", $"alarm").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    val (mu, k, h) = (EventStreams.CusumTarget, EventStreams.CusumSlack,
      EventStreams.CusumThreshold)
    val rows = Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var (p, n) = (0.0, 0.0)
      es.sortBy(e => (e._2, e._3)).toSeq.map { case (_, _, id, v) =>
        val sPos = math.max(0.0, p + (v - mu - k))
        val sNeg = math.max(0.0, n - (v - mu + k))
        val alarm = sPos > h || sNeg > h
        if (alarm) { p = 0.0; n = 0.0 } else { p = sPos; n = sNeg }
        id -> ((math.rint(sPos * 1e6) / 1e6, math.rint(sNeg * 1e6) / 1e6, alarm))
      }
    }
    assert(streamed.size == rows.length, "one emission per event expected")
    val mism = expected.count { case (id, e) => streamed(id) != e }
    assert(mism == 0, s"$mism events diverge from the sequential CUSUM fold")
    // the detector is live on this fixture: at least one alarm fires
    assert(expected.exists(_._2._3), "fixture never crosses the CUSUM threshold")
  }

  test("streaming anomaly moments converge to the batch moment sums exactly") {
    import spark.implicits._
    EventStreams.runToMemory(
      EventStreams.anomalyMoments(spark,
        EventStreams.fileSource(spark, inputDir)).toDF(),
      "moments_smoke", OutputMode.Update())
    // update mode: moments grow monotonically, so the max over a type's
    // emissions IS the drained-stream state
    val streamed = spark.table("moments_smoke")
      .groupBy("event_type")
      .agg(max($"n").as("s_n"), max($"sx").as("s_sx"), max($"sxx").as("s_sxx"))
    val batch = Tables.events(spark, sfDir)
      .select($"event_type", round($"value" * 100, 0).cast("long").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("b_n"), sum($"c").as("b_sx"),
        sum($"c" * $"c").as("b_sxx"))
    assert(batch.count() > 0 && streamed.count() == batch.count())
    val mism = streamed.join(batch, "event_type")
      .filter($"s_n" =!= $"b_n" || $"s_sx" =!= $"b_sx" || $"s_sxx" =!= $"b_sxx")
      .count()
    assert(mism == 0, "streaming moments diverged from batch moment sums")
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
