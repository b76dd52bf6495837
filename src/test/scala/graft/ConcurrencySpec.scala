package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite

/** A shared engine serves many queries at once on a real cluster; the
  * operators must hold no mutable state that cross-talks between
  * concurrently planning/executing queries (e.g. the LshKnn plane
  * cache, extension-registered functions, AQE re-planning).
  */
class ConcurrencySpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("concurrent query execution matches sequential results") {
    val names = Seq(
      "q_agg_hash", "q_join_inner", "q_wordcount", "q_median",
      "q_topk", "q_dedup_exact", "q_scalar_math", "q_window_rank")
    val sequential = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sfDir).collect().toSeq
    }.toMap
    implicit val ec: ExecutionContext = ExecutionContext.global
    val concurrent = Await.result(
      Future.sequence(names.map { n =>
        Future(n -> SparkEntry.queries(n)(spark, sfDir).collect().toSeq)
      }), 180.seconds).toMap
    names.foreach { n =>
      assert(concurrent(n) == sequential(n), s"$n diverged under concurrency")
    }
  }
}
