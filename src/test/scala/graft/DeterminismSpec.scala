package graft

import org.scalatest.funsuite.AnyFunSuite

/** Run-to-run determinism over the whole oracle surface. The DuckDB
  * hash-compare can coincidentally pass a nondeterministic query (one
  * lucky ordering); executing each query twice in-process catches
  * unordered collects, ties without tie-breaks, and partitioning-
  * dependent floats directly — the engine's own
  * reproducible-under-ANY-scheduling claim, enforced.
  */
class DeterminismSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("every oracle query returns identical rows on repeated execution") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val a = fn(spark, sfDir).collect().toSeq
      val b = fn(spark, sfDir).collect().toSeq
      assert(a.size == b.size, s"$name row count differs across runs")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra == rb, s"$name differs at row $i: $ra vs $rb")
      }
    }
  }
}
