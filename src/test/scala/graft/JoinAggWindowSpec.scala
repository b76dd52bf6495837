package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants for the join / aggregation / window surface at
  * sf0.001 — complements the driver's DuckDB oracle with checks that
  * hold for ANY data (SURVEY.md §5.3).
  */
class JoinAggWindowSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("pivot rows sum back to per-user totals; unpivot is the exact inverse reshape") {
    import spark.implicits._
    val pivoted = q("q_pivot")
    val rowSums = pivoted.select($"user_id",
      ($"click" + $"error" + $"purchase" + $"signup" + $"view").as("total"))
    val expected = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("expected"))
    assert(rowSums.join(expected, "user_id")
      .filter($"total" =!= $"expected").count() == 0)
    assert(pivoted.count() == expected.count())
    // unpivot: exactly 2 metric rows per flag, values match the wide agg
    val up = q("q_unpivot")
    assert(up.groupBy("l_returnflag").count()
      .filter($"count" =!= 2).count() == 0)
  }

  test("semi and anti joins partition the customers (threshold variant)") {
    import spark.implicits._
    val semi = q("q_join_semi").select("c_custkey").as[Long].collect().toSet
    val anti = q("q_join_anti").select("c_custkey").as[Long].collect().toSet
    val all = Tables.customer(spark, sfDir).select("c_custkey").as[Long].collect().toSet
    assert((semi & anti).isEmpty)
    assert((semi | anti) == all)
  }

  test("left join keeps every customer and counts every order") {
    import spark.implicits._
    val out = q("q_join_left")
    assert(out.count() == Tables.customer(spark, sfDir).count())
    val totalOrders = out.agg(sum($"n_orders")).as[Long].head()
    assert(totalOrders == Tables.orders(spark, sfDir).count())
  }

  test("inner join revenue equals sum over all orders with a customer") {
    import spark.implicits._
    val perSegment = q("q_join_inner").agg(sum($"n_orders")).as[Long].head()
    assert(perSegment == Tables.orders(spark, sfDir).count())
  }

  test("rollup: leaf counts roll up to region level and grand total") {
    import spark.implicits._
    val out = q("q_agg_rollup").collect()
    val gids = out.map(_.getAs[Int]("gid")).toSet
    assert(gids == Set(0, 1, 3))
    val leaf = out.filter(_.getAs[Int]("gid") == 0).map(_.getAs[Long]("n_orders")).sum
    val total = out.filter(_.getAs[Int]("gid") == 3).map(_.getAs[Long]("n_orders")).sum
    assert(leaf == total)
  }

  test("cube: all four grouping levels present, totals agree") {
    val out = q("q_agg_cube").collect()
    assert(out.map(_.getAs[Int]("gid")).toSet == Set(0, 1, 2, 3))
    val byGid = out.groupBy(_.getAs[Int]("gid"))
      .view.mapValues(_.map(_.getAs[Long]("n_orders")).sum).toMap
    assert(byGid(0) == byGid(3) && byGid(1) == byGid(3) && byGid(2) == byGid(3))
  }

  test("topk: 20 rows in strict (price desc, orderkey asc) order") {
    val rows = q("q_topk").collect()
    assert(rows.length == 20)
    val pairs = rows.map(r => (-r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
    assert(pairs.toSeq == pairs.toSeq.sorted)
  }

  test("set algebra: intersect within union; except disjoint from events users") {
    import spark.implicits._
    val union = q("q_set_union").select("nationkey").as[Int].collect().toSet
    val inter = q("q_set_intersect").as[Int].collect().toSet
    assert(inter.subsetOf(union))
    val except = q("q_set_except").as[Long].collect().toSet
    val users = Tables.events(spark, sfDir).select("user_id").as[Long].collect().toSet
    assert((except & users).isEmpty)
  }

  test("window rank: at most 3 rows per customer, rn dense from 1") {
    import spark.implicits._
    val bad = q("q_window_rank").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), min($"rn").as("lo"), max($"rn").as("hi"))
      .filter($"n" > 3 || $"lo" =!= 1 || $"hi" =!= $"n")
      .count()
    assert(bad == 0)
  }

  test("window frame: last running value equals the customer's total") {
    import spark.implicits._
    val lastRunning = q("q_window_frame")
      .groupBy("o_custkey").agg(max(struct($"o_orderdate", $"o_orderkey", $"running_revenue")).as("s"))
      .select($"o_custkey", $"s.running_revenue".as("run"))
    val direct = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("tot"))
    val bad = lastRunning.join(direct, "o_custkey")
      .filter(abs($"run" - $"tot") > 1e-6).count()
    assert(bad == 0)
  }

  test("asof join: matched order always precedes the event") {
    import spark.implicits._
    val bad = q("q_join_asof").filter($"o_orderdate" > $"ts").count()
    assert(bad == 0)
    // at most one row per event
    val dup = q("q_join_asof").groupBy("event_id").count().filter($"count" > 1).count()
    assert(dup == 0)
  }

  test("window analytic: delta equals value minus prev_value") {
    import spark.implicits._
    val bad = q("q_window_analytic")
      .filter($"prev_value".isNotNull && $"delta" =!= ($"value" - $"prev_value"))
      .count()
    assert(bad == 0)
  }

  test("bloom-pruned join is row-identical to the plain join") {
    import spark.implicits._
    val bloom = q("q_join_bloom")
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter($"p_size" <= 5),
        $"l_partkey" === $"p_partkey")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        (sum(round($"l_quantity" * 100).cast("long"))
          .cast("double") / 100.0).as("total_qty"))
      .orderBy(asc_nulls_first("p_brand"))
    assert(bloom.exceptAll(plain).count() == 0 &&
      plain.exceptAll(bloom).count() == 0)
  }
}
