package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the scalar-function and event-windowing queries. */
class ScalarEventSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("scalar string: derived columns are consistent with p_name") {
    import spark.implicits._
    val bad = q("q_scalar_string")
      .filter(length($"name_underscored") =!= $"name_len" ||
        upper($"name_upper") =!= $"name_upper")
      .count()
    assert(bad == 0)
  }

  test("scalar date: month_start is the first of the order's month") {
    import spark.implicits._
    val bad = q("q_scalar_date")
      .filter(year($"month_start") =!= $"yr" ||
        month($"month_start") =!= $"mo" ||
        dayofmonth($"month_start") =!= 1)
      .count()
    assert(bad == 0)
  }

  test("scalar math: sqrt/floor/ceil bracket the inputs") {
    import spark.implicits._
    val bad = q("q_scalar_math")
      .filter($"price_ceil" < $"price_floor" ||
        abs($"qty_sqrt" * $"qty_sqrt" - $"l_quantity") > 1e-4 ||
        $"okey_mod7" < 0 || $"okey_mod7" > 6)
      .count()
    assert(bad == 0)
  }

  test("scalar case: bands partition all orders") {
    import spark.implicits._
    val n = q("q_scalar_case").agg(sum($"n_orders")).as[Long].head()
    assert(n == Tables.orders(spark, sfDir).count())
  }

  test("scalar json: k bounds ordered, counts total") {
    import spark.implicits._
    val out = q("q_scalar_json")
    assert(out.filter($"min_k" > $"max_k").count() == 0)
    assert(out.agg(sum($"n_events")).as[Long].head() ==
      Tables.events(spark, sfDir).count())
  }

  test("scalar array: 64-dim vectors with positive norms") {
    import spark.implicits._
    val bad = q("q_scalar_array")
      .filter($"dim" =!= 64 || $"l2_norm" <= 0.0).count()
    assert(bad == 0)
  }

  test("tumbling windows: counts sum to total events") {
    import spark.implicits._
    assert(q("q_stream_tumbling").agg(sum($"n_events")).as[Long].head() ==
      Tables.events(spark, sfDir).count())
  }

  test("sliding windows: each event in exactly two windows") {
    import spark.implicits._
    assert(q("q_stream_sliding").agg(sum($"n_events")).as[Long].head() ==
      2 * Tables.events(spark, sfDir).count())
  }

  test("session windows: events partition into sessions; duration consistent") {
    import spark.implicits._
    val out = q("q_session_window")
    assert(out.agg(sum($"n_events")).as[Long].head() ==
      Tables.events(spark, sfDir).count())
    val bad = out.filter($"duration_us" < 0 ||
      ($"n_events" === 1 && $"duration_us" =!= 0)).count()
    assert(bad == 0)
  }

  test("scd2: versions partition events; intervals chain without gaps") {
    import spark.implicits._
    val out = q("q_scd2")
    // Every event lands in exactly one version.
    assert(out.agg(sum($"n_events")).as[Long].head() ==
      Tables.events(spark, sfDir).count())
    // Versions are 1..k per user and consecutive runs differ in type.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy($"version")
    val bad = out
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .withColumn("prev_to", lag($"valid_to", 1).over(w))
      .filter(($"prev_type".isNotNull && $"prev_type" === $"event_type") ||
        ($"prev_to".isNotNull && $"prev_to" =!= $"valid_from"))
      .count()
    assert(bad == 0)
    // Exactly one open (valid_to IS NULL) version per user.
    assert(out.filter($"valid_to".isNull).groupBy("user_id").count()
      .filter($"count" =!= 1).count() == 0)
  }

  test("time-weighted: span-positive users only; twa within value range") {
    import spark.implicits._
    val out = q("q_time_weighted")
    assert(out.filter($"duration_us" <= 0).count() == 0)
    val range = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    // Zero-order-hold average is bounded by the per-user value range
    // (up to the 1-cent quantization of the weights).
    val bad = out.join(range, Seq("user_id"))
      .filter($"twa" < $"lo" - 0.01 || $"twa" > $"hi" + 0.01)
      .count()
    assert(bad == 0)
  }

  test("dedup latest: one row per (user, type), keeps the max ts") {
    import spark.implicits._
    val out = q("q_dedup_latest")
    assert(out.groupBy("user_id", "event_type").count()
      .filter($"count" > 1).count() == 0)
    val maxTs = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type").agg(max($"ts").as("max_ts"))
    val bad = out.join(maxTs, Seq("user_id", "event_type"))
      .filter($"ts" =!= $"max_ts").count()
    assert(bad == 0)
  }

  test("q_session_percentiles: weekly counts cover all sessions; p50 <= p90") {
    val out = q("q_session_percentiles").collect()
    val nSessions = q("q_session_window").count()
    assert(out.map(_.getAs[Long]("n_sessions")).sum == nSessions)
    out.foreach { r =>
      val (p50, p90) = (r.getAs[Double]("p50_duration_s"),
        r.getAs[Double]("p90_duration_s"))
      assert(p50 >= 0 && p50 <= p90 + 1e-9, s"p50 $p50 > p90 $p90")
      assert(r.getAs[Double]("avg_events") >= 1.0 - 1e-9)
    }
  }

  test("q_session_percentiles_gk: GK values are order statistics within rank error n/accuracy") {
    import spark.implicits._
    // exact per-week sorted duration columns, recomputed independently
    val exact = graft.operators.EventQueries
      .sessionWindows(Tables.events(spark, sfDir))
      .select(date_trunc("week", $"session_start").as("week"), $"duration_us")
      .as[(java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).map { case (w, v) => w -> v.map(_._2).sorted }
    val out = q("q_session_percentiles_gk").collect()
    assert(out.nonEmpty && out.length == exact.size)
    // the swap is drop-in: same weeks + session counts as the exact query
    val exactQ = q("q_session_percentiles").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("week"),
        r.getAs[Long]("n_sessions"))).toMap
    out.foreach { r =>
      val w = r.getAs[java.sql.Timestamp]("week")
      val n = r.getAs[Long]("n_sessions").toInt
      assert(exactQ(w) == n, s"week $w session count diverges from exact")
      val sorted = exact(w)
      assert(sorted.length == n)
      Seq(50 -> "p50_duration_s", 90 -> "p90_duration_s").foreach {
        case (p, cname) =>
          val us = math.round(r.getAs[Double](cname) * 1e6)
          // GK guarantee: the reported value is a MEMBER of the column
          // whose rank is within n/accuracy of the target (+1 for the
          // boundary convention); ties occupy a rank range.
          val lo = sorted.indexOf(us)
          val hi = sorted.lastIndexOf(us)
          assert(lo >= 0, s"week $w $cname=$us not a member of the column")
          val target = math.ceil(n * p / 100.0)
          val slack = n.toDouble / graft.operators.EventQueries.GkAccuracy + 1
          val dist = if (target < lo + 1) (lo + 1) - target
                     else if (target > hi + 1) target - (hi + 1)
                     else 0.0
          assert(dist <= slack,
            s"week $w $cname=$us at ranks ${lo + 1}..${hi + 1}, " +
              s"target $target, slack $slack")
      }
      assert(r.getAs[Double]("p50_duration_s") <=
        r.getAs[Double]("p90_duration_s") + 1e-9)
    }
  }

  test("q_bounce_rate: reconciles with q_session_percentiles week counts") {
    val out = q("q_bounce_rate").collect()
    val weeks = q("q_session_percentiles").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("week"),
        r.getAs[Long]("n_sessions"))).toMap
    assert(out.nonEmpty && out.length == weeks.size)
    out.foreach { r =>
      assert(r.getAs[Long]("n_sessions") ==
        weeks(r.getAs[java.sql.Timestamp]("week")))
      val br = r.getAs[Double]("bounce_rate")
      assert(br >= 0 && br <= 1.0)
      assert(r.getAs[Long]("n_bounces") <= r.getAs[Long]("n_sessions"))
    }
  }

  test("q_session_native: >= boundary splits at least as many sessions as >") {
    val native = q("q_session_native").collect()
    val manual = q("q_session_window").count()
    assert(native.length >= manual,
      s"native ${native.length} sessions < manual $manual")
    // events conserved across both sessionizations
    assert(native.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
    native.foreach { r =>
      val d = r.getAs[Long]("duration_us")
      assert(d >= 0)
      // native exclusive end = last event + 30 min (±1 ms: getTime
      // truncates the microsecond component)
      val span = r.getAs[java.sql.Timestamp]("session_end").getTime -
        r.getAs[java.sql.Timestamp]("session_start").getTime
      assert(math.abs(span - (d / 1000 + 30 * 60 * 1000)) <= 1,
        s"end-start $span vs duration $d")
    }
  }

  test("q_ab_test: arms partition the user base; z sign matches the gap") {
    val r = q("q_ab_test").collect().head
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_control") + r.getAs[Long]("n_treatment") == nUsers)
    assert(r.getAs[Long]("conv_control") <= r.getAs[Long]("n_control"))
    assert(r.getAs[Long]("conv_treatment") <= r.getAs[Long]("n_treatment"))
    if (!r.isNullAt(r.fieldIndex("z_stat"))) {
      val (gap, z) = (r.getAs[Double]("conversion_gap"),
        r.getAs[Double]("z_stat"))
      assert(gap == 0 || gap.sign == z.sign, s"gap $gap vs z $z")
    }
  }
}
