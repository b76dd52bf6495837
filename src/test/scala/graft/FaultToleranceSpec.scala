package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's flagship correctness test is crash recovery:
  * `/root/reference/mrapps/crash.go:22-34` makes map/reduce tasks
  * `os.Exit(1)` randomly and the test requires final output identical
  * to the `nocrash` golden run; `mrapps/jobcount.go:24-48` additionally
  * asserts re-executed tasks leave no duplicate side effects in the
  * output. Spark's analogue of both: every task of one stage throws on
  * its first attempt, the scheduler re-executes (test session master is
  * local[4,2] → maxFailures 2), and the job's OUTPUT must equal the
  * clean run exactly even though the stage's code demonstrably ran
  * twice per partition.
  */
object CrashOnce {
  /** partitionId → times the flaky stage's function ran (any attempt). */
  val executions = new ConcurrentHashMap[Int, AtomicLong]()

  def reset(): Unit = executions.clear()

  def totalExecutions: Long = {
    var s = 0L
    executions.forEach((_, v) => s += v.get())
    s
  }

  /** Identity over the partition that records the execution and throws
    * on attempt 0 — every task of the stage fails once, succeeds on
    * retry. Runs in-JVM under local mode, so static state observes all
    * "executors".
    */
  def flakyIdentity[T](rows: Iterator[T]): Iterator[T] = {
    val tc = TaskContext.get()
    executions.computeIfAbsent(tc.partitionId(), _ => new AtomicLong())
      .incrementAndGet()
    if (tc.attemptNumber() == 0)
      throw new RuntimeException(
        s"injected crash: partition ${tc.partitionId()} attempt 0")
    rows
  }
}

class FaultToleranceSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("crash: every task fails once, retried output equals the clean run") {
    import spark.implicits._
    CrashOnce.reset()

    val texts = Tables.documents(spark, sfDir)
      .select(col("text").as("value")).as[String]
    def wordcount(ds: org.apache.spark.sql.Dataset[String]) = ds
      .select(explode(operators.TextQueries.tokens(col("value"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

    val clean = wordcount(texts)
    val flaky = wordcount(texts.mapPartitions(CrashOnce.flakyIdentity[String] _))

    val cleanRows = clean.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val flakyRows = flaky.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(flakyRows == cleanRows,
      "retried execution diverged from the clean run")

    // the crash actually happened: each partition of the flaky stage ran
    // at least twice (attempt 0 threw, attempt 1 finished)
    assert(!CrashOnce.executions.isEmpty, "flaky stage never ran")
    CrashOnce.executions.forEach((pid, n) =>
      assert(n.get() >= 2, s"partition $pid was never re-executed"))
  }

  test("pagerank: iterative loop with lazy checkpoints survives task crashes, equals clean run") {
    import spark.implicits._
    CrashOnce.reset()

    // a ring plus chords — every node has in/out edges (the operator's
    // symmetrized-input contract)
    val n = 64L
    val ring = spark.range(0, n, 1, 4)
      .select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
    val chords = spark.range(0, n, 1, 4)
      .select(col("id").as("src"), ((col("id") + 7) % n).as("dst"))
    val undirected = ring.unionAll(chords)
    val edges = undirected.unionAll(
      undirected.select(col("dst").as("src"), col("src").as("dst")))

    val clean = operators.GraphOps.pageRank(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // inject the crash into the edge input: the flaky stage feeds the
    // eager edgesDeg checkpoint AND each iteration's join re-reads the
    // checkpointed blocks — retries must not double-count contributions
    val flakyEdges = edges.as[(Long, Long)]
      .mapPartitions(CrashOnce.flakyIdentity[(Long, Long)] _)
      .toDF("src", "dst")
    val flaky = operators.GraphOps.pageRank(flakyEdges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flaky == clean, "retried pagerank diverged from the clean run")
    assert(!CrashOnce.executions.isEmpty, "flaky stage never ran")
  }

  test("jobcount: re-executed tasks produce exactly-once output effects") {
    import spark.implicits._
    CrashOnce.reset()

    // 1000 distinct ids through a flaky stage, then a count per id: any
    // duplicated (or lost) emission from the doubled task executions
    // would surface as a count != 1 — the reference's jobcount property
    // (task ran N times, output reflects it once).
    val ids = spark.range(0, 1000, 1, 8).as[Long]
    val out = ids.mapPartitions(CrashOnce.flakyIdentity[Long] _)
      .groupBy("value").agg(count(lit(1)).as("n"))
    assert(out.filter(col("n") =!= 1).count() == 0,
      "a re-executed task duplicated or dropped rows in the output")
    assert(out.count() == 1000)
    assert(CrashOnce.totalExecutions >= 16,
      "expected every one of the 8 partitions to execute at least twice")
  }
}
