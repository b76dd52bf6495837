package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface: the same event-time operators as the
  * batch EventQueries, run incrementally. The reference has no streaming
  * at all — this is north-star surface expressed the Spark-native way:
  * `readStream` file source → watermarked event-time aggregation →
  * append-mode sink, plus a typed `mapGroupsWithState` operator for
  * custom state machines (the streaming analogue of the reference's
  * stateful `reducef` plugin surface).
  *
  * Scale notes: a watermarked tumbling aggregation keeps state only for
  * open windows (bounded by watermark delay × key cardinality); the
  * stateful per-user counter keys state by user_id, so state shards
  * across executors with the shuffle. Nothing here collects to the
  * driver.
  */
object EventStreams {

  /** Schema of the (micros-ts) event stream on disk — matches
    * graft.Tables.events output, which is what tests replay as files.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def fileSource(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** 1-hour tumbling counts per event_type with a 10-minute watermark —
    * the streaming twin of EventQueries.qStreamTumbling. In append mode
    * a window emits once the watermark passes its end; rows later than
    * the watermark are dropped.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrichment — the standard dimension-join pattern: a
    * streaming event source joins a STATIC dimension frame (user →
    * tier here), then aggregates per tier in tumbling windows. Spark
    * plans the static side as a broadcast re-read per micro-batch, so
    * the stream never re-shuffles on the join key and the state store
    * holds only the windowed aggregate — the shape that keeps a 100 TB/
    * day stream's enrichment cost proportional to the BATCH, not the
    * dimension's history.
    */
  def enrichedTierCounts(events: DataFrame, userTiers: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .join(userTiers, Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour"), col("tier"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("tier"),
        col("n_events"))

  /** 1-hour windows sliding every 30 minutes (each event lands in
    * exactly two windows) — the streaming twin of
    * EventQueries.qStreamSliding, same watermark/append contract as
    * tumblingCounts.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  case class UserCount(user_id: Long, n_events: Long)

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long) {
    def tsUs: Long = ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** Streaming sessionizer: per-user sessions with a strict >gap
    * inactivity boundary (the same algebra as the batch
    * q_session_window), as a flatMapGroupsWithState state machine with
    * EVENT-TIME timeout — a session closes either when a later event
    * arrives past the gap, or when the watermark passes lastTs+gap (the
    * timeout path), so state is bounded and sessions emit without
    * waiting for the user's next event. Events are sorted
    * (ts, event_id) within each batch; correctness across batches
    * assumes arrival disorder stays within the watermark delay — the
    * same contract every watermarked streaming aggregation has.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // the watermarked `ts` column itself must reach the stateful
    // operator — projecting it away breaks EventTimeTimeout
    events
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          if (state.hasTimedOut) {
            state.getOption.foreach(s =>
              out += SessionOut(user, s.startUs, s.lastUs, s.n))
            state.remove()
          } else {
            var open = state.getOption
            batch.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
              open = open match {
                case Some(s) if e.tsUs - s.lastUs <= gapUs =>
                  Some(OpenSession(s.startUs, math.max(s.lastUs, e.tsUs), s.n + 1))
                case Some(s) =>
                  out += SessionOut(user, s.startUs, s.lastUs, s.n)
                  Some(OpenSession(e.tsUs, e.tsUs, 1))
                case None =>
                  Some(OpenSession(e.tsUs, e.tsUs, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000 + gapMinutes * 60L * 1000)
            }
          }
          out.iterator
      }
  }

  case class Moments(n: Long, sx: Long, sxx: Long)
  case class MomentsOut(event_type: String, n: Long, sx: Long, sxx: Long)

  /** Streaming per-type moment accumulation — the incremental twin of
    * the batch q_anomaly's stats pass. State per event type is three
    * longs (n, Σcents, Σcents²): O(1), exactly the integer algebra the
    * batch query aggregates, so after the stream drains the final
    * state EQUALS the batch moments row-for-row (StreamingSmokeSpec
    * proves it on the replay) and the z-score threshold derived from
    * it flags the identical events. At 100 TB-rate this is the shape
    * anomaly monitoring actually runs: the expensive global stats are
    * maintained incrementally per micro-batch instead of recomputed
    * by a daily scan, and the flagging pass stays a stateless
    * broadcast-join filter against the latest emitted moments.
    */
  def anomalyMoments(spark: SparkSession, events: DataFrame): Dataset[MomentsOut] = {
    import spark.implicits._
    events.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Moments, MomentsOut](GroupStateTimeout.NoTimeout) {
        (tpe: String, batch: Iterator[(String, Long)], state: GroupState[Moments]) =>
          var s = state.getOption.getOrElse(Moments(0L, 0L, 0L))
          batch.foreach { case (_, c) =>
            s = Moments(s.n + 1L, s.sx + c, s.sxx + c * c)
          }
          state.update(s)
          MomentsOut(tpe, s.n, s.sx, s.sxx)
      }
  }

  case class EwmaEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, value: Double) {
    def tsUs: Long = ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }
  case class EwmaCarry(ewma: Double)
  case class EwmaOut(user_id: Long, event_id: Long, value: Double, ewma: Double)

  /** Streaming EWMA: the TRUE recursion `ewma ← α·x + (1−α)·ewma` per
    * user, which batch SQL cannot express without recursion — the batch
    * q_ewma is its bounded-lag approximation (weights α·(1−α)^j
    * truncated at 8 lags, ≈6% tail mass renormalized away). O(1) state
    * per user (one double), sharded with the shuffle; each micro-batch
    * processes its rows in (ts, event_id) order, so on a time-ordered
    * replay the emitted sequence equals the sequential recursion
    * exactly — StreamingSmokeSpec proves it against an in-memory fold.
    * The first observation seeds the recursion (ewma₀ = x₀), matching
    * the renormalized batch form at n=1.
    */
  def ewmaState(spark: SparkSession, events: DataFrame): Dataset[EwmaOut] = {
    import spark.implicits._
    val alpha = graft.operators.EventQueries.EwmaAlpha
    events.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[EwmaEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaCarry, EwmaOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[EwmaEvent], state: GroupState[EwmaCarry]) =>
          val ordered = batch.toSeq.sortBy(e => (e.tsUs, e.event_id))
          var carry = state.getOption
          val out = ordered.map { e =>
            val next = carry match {
              case Some(EwmaCarry(prev)) => alpha * e.value + (1.0 - alpha) * prev
              case None => e.value
            }
            carry = Some(EwmaCarry(next))
            EwmaOut(uid, e.event_id, e.value,
              math.rint(next * 1e6) / 1e6)
          }
          carry.foreach(state.update)
          out.iterator
      }
  }

  case class HoltCarry(level: Double, trend: Double)
  case class HoltOut(user_id: Long, event_id: Long, value: Double,
      level: Double, trend: Double, forecast: Double)

  /** Streaming Holt double-exponential smoother per user: level ←
    * α·x + (1−α)·(level+trend), trend ← β·(level−level₋₁) + (1−β)·trend
    * — EWMA plus a trend term, the one-step forecaster (forecast =
    * level + trend) behind capacity alerts. Like EWMA/CUSUM the
    * recursion has no bounded-lag batch form once the trend feeds back;
    * O(1) state (two doubles) per user, sharded with the shuffle,
    * (ts, event_id)-ordered per batch, so an ordered replay reproduces
    * the sequential fold bit-for-bit (StreamingSmokeSpec). Seeds:
    * level₀ = x₀, trend₀ = 0 (the renormalized-EWMA convention at n=1).
    */
  val HoltAlpha = 0.3
  val HoltBeta = 0.1
  def holtState(spark: SparkSession, events: DataFrame): Dataset[HoltOut] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[EwmaEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HoltCarry, HoltOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[EwmaEvent], state: GroupState[HoltCarry]) =>
          val ordered = batch.toSeq.sortBy(e => (e.tsUs, e.event_id))
          var carry = state.getOption
          val out = ordered.map { e =>
            val next = carry match {
              case Some(HoltCarry(l, b)) =>
                val l2 = HoltAlpha * e.value + (1.0 - HoltAlpha) * (l + b)
                val b2 = HoltBeta * (l2 - l) + (1.0 - HoltBeta) * b
                HoltCarry(l2, b2)
              case None => HoltCarry(e.value, 0.0)
            }
            carry = Some(next)
            HoltOut(uid, e.event_id, e.value,
              math.rint(next.level * 1e6) / 1e6,
              math.rint(next.trend * 1e6) / 1e6,
              math.rint((next.level + next.trend) * 1e6) / 1e6)
          }
          carry.foreach(state.update)
          out.iterator
      }
  }

  case class CusumCarry(sPos: Double, sNeg: Double)
  case class CusumOut(user_id: Long, event_id: Long, value: Double,
      s_pos: Double, s_neg: Double, alarm: Boolean)

  /** Streaming CUSUM changepoint detector per user: the Page (1954)
    * sequential drift alarm S⁺ ← max(0, S⁺ + (x−μ−κ)),
    * S⁻ ← max(0, S⁻ − (x−μ+κ)), alarm when either side crosses h, then
    * reset both — inherently recursive (each step depends on the
    * clamped previous), so it has no batch SQL form; this is the
    * stateful-streaming twin of q_drift_psi's batch two-window gate.
    * O(1) state per user (two doubles), sharded with the shuffle;
    * rows process in (ts, event_id) order per micro-batch, so on a
    * time-ordered replay the emitted sequence equals the sequential
    * fold exactly (StreamingSmokeSpec proves bit-equality, the EWMA
    * recipe). μ/κ/h are fixed detector constants: κ the half-shift
    * declared worth detecting, h the accumulated-evidence threshold.
    */
  val CusumTarget = 500.0  // μ: in-control mean of `value`
  val CusumSlack = 50.0    // κ: allowance (half the shift to detect)
  val CusumThreshold = 500.0 // h: alarm when S exceeds this
  def cusumState(spark: SparkSession, events: DataFrame): Dataset[CusumOut] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[EwmaEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumCarry, CusumOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[EwmaEvent], state: GroupState[CusumCarry]) =>
          val ordered = batch.toSeq.sortBy(e => (e.tsUs, e.event_id))
          var carry = state.getOption.getOrElse(CusumCarry(0.0, 0.0))
          val out = ordered.map { e =>
            val sPos = math.max(0.0, carry.sPos + (e.value - CusumTarget - CusumSlack))
            val sNeg = math.max(0.0, carry.sNeg - (e.value - CusumTarget + CusumSlack))
            val alarm = sPos > CusumThreshold || sNeg > CusumThreshold
            carry = if (alarm) CusumCarry(0.0, 0.0) else CusumCarry(sPos, sNeg)
            CusumOut(uid, e.event_id, e.value,
              math.rint(sPos * 1e6) / 1e6, math.rint(sNeg * 1e6) / 1e6, alarm)
          }
          state.update(carry)
          out.iterator
      }
  }

  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String) {
    def tsUs: Long = ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }
  case class FunnelProgress(tViewUs: Option[Long], tClickUs: Option[Long],
      tPurchaseUs: Option[Long])
  case class FunnelOut(user_id: Long, t_view_us: Option[Long],
      t_click_us: Option[Long], t_purchase_us: Option[Long], depth: Int)

  /** Streaming funnel: the incremental twin of the batch
    * BehaviorQueries.qFunnel (view → click strictly after → purchase
    * strictly after), as a typed mapGroupsWithState state machine in
    * update mode. State is three optional timestamps per user — O(1),
    * monotone (a stage timestamp freezes once set, so emitted rows only
    * ever deepen), sharded by user_id with the shuffle.
    *
    * Exactness contract: each batch is processed in (ts, event_id)
    * order, so when per-user arrival is event-time-ordered ACROSS
    * triggers (a replayed log, or any source whose per-user streams are
    * time-ordered), the first qualifying event per stage is the minimal
    * one and the final state equals the batch query row-for-row —
    * StreamingFunnelSpec proves it on the 8-chunk replay. Under
    * cross-batch disorder a late earlier view cannot retroactively
    * requalify clicks already seen; that approximation (not a buffer of
    * the whole stream) is the standard streaming-funnel trade.
    */
  def funnelState(spark: SparkSession, events: DataFrame): Dataset[FunnelOut] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelProgress, FunnelOut](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          var s = state.getOption.getOrElse(FunnelProgress(None, None, None))
          batch.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
            e.event_type match {
              case "view" if s.tViewUs.isEmpty =>
                s = s.copy(tViewUs = Some(e.tsUs))
              case "click" if s.tClickUs.isEmpty && s.tViewUs.exists(_ < e.tsUs) =>
                s = s.copy(tClickUs = Some(e.tsUs))
              case "purchase" if s.tPurchaseUs.isEmpty && s.tClickUs.exists(_ < e.tsUs) =>
                s = s.copy(tPurchaseUs = Some(e.tsUs))
              case _ =>
            }
          }
          state.update(s)
          val depth =
            if (s.tPurchaseUs.isDefined) 3
            else if (s.tClickUs.isDefined) 2
            else if (s.tViewUs.isDefined) 1
            else 0
          FunnelOut(user, s.tViewUs, s.tClickUs, s.tPurchaseUs, depth)
      }
  }

  /** Custom stateful operator: running per-user event counts via typed
    * mapGroupsWithState (update mode). State is one long per user —
    * partitioned by the group key across executors.
    */
  def runningUserCounts(spark: SparkSession, events: DataFrame): Dataset[UserCount] = {
    import spark.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Long], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + batch.size
          state.update(next)
          UserCount(user, next)
      }
  }

  /** Stream-stream interval join: purchase→click attribution pairs —
    * every (purchase, click) of the same user where the click happened
    * within the hour before the purchase. Both sides carry a watermark
    * and the join condition bounds click time relative to purchase
    * time, so Spark evicts join state once the watermark passes the
    * interval: state is bounded by (watermark delay + interval) × rate,
    * not by stream length — the streaming twin of the batch
    * q_join_asof_banded's candidate generation.
    */
  def purchaseClickPairs(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    // bounds match the batch q_join_asof_banded exactly (inclusive upper,
    // strict lower), so reducing these pairs to the latest click per
    // purchase reproduces the batch as-of answer row-for-row
    purchases.join(clicks,
      col("p_user_id") === col("c_user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("p_user_id").as("user_id"),
        col("p_ts"), col("click_id"), col("c_ts"))
  }

  /** Streaming dedup: first event per (user_id, event_type), state
    * bounded by the watermark — the streaming twin of the batch
    * q_dedup_latest family (`dropDuplicatesWithinWatermark` evicts seen
    * keys once the watermark passes them, so state does not grow with
    * the stream).
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Convenience: run a streaming DataFrame to an in-memory table until
    * all available input is consumed, return the result table name.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Run a streaming DataFrame to a parquet sink with a durable
    * checkpoint, consuming all currently-available input, then stop.
    * Calling this again with the same checkpoint resumes EXACTLY where
    * the last run committed: the file-sink log plus the source offsets
    * in the checkpoint give end-to-end exactly-once across restarts —
    * the reference's crash/jobcount guarantee (re-executed work must
    * not duplicate output), but across whole process lifetimes, not
    * just task retries. Exercised by StreamingRestartSpec.
    */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String,
      mode: OutputMode = OutputMode.Append()): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
