package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.graft.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-level IO metering for SCALING.md's proportionality claims:
  * sums `inputMetrics.bytesRead` / `outputMetrics.bytesWritten` over
  * every task that completes inside `measure`'s body — the number that
  * shows whether a probe actually PRUNED its reads (wall time alone
  * can't: a 32-thread local host hides IO in parallelism and noise).
  * Single-measurement scope; not re-entrant (fine for the sequential
  * smoke drivers that use it).
  */
object IoMeter {
  final case class Io(bytesRead: Long, bytesWritten: Long) {
    def readMb: Double = bytesRead / 1e6
    def writtenMb: Double = bytesWritten / 1e6
  }

  def measure[T](spark: SparkSession)(body: => T): (T, Io) = {
    val read = new AtomicLong
    val written = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          read.addAndGet(m.inputMetrics.bytesRead)
          written.addAndGet(m.outputMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      ListenerBridge.waitUntilListenersProcessed(spark.sparkContext)
      (r, Io(read.get, written.get))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
