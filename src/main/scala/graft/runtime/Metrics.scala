package graft.runtime

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Lightweight job-level metrics via SparkListener: task counts, records
  * read/written, shuffle bytes, spill — the throughput/lineage telemetry
  * the north_rule asks to emit per partition. Attach around a job, then
  * `snapshotJson` into the run manifest.
  */
final class MetricsListener extends SparkListener {
  val tasks = new LongAdder
  val failedTasks = new LongAdder
  val recordsRead = new LongAdder
  val recordsWritten = new LongAdder
  val shuffleReadBytes = new LongAdder
  val shuffleWriteBytes = new LongAdder
  val spillBytes = new LongAdder
  val executorCpuNanos = new LongAdder
  val peakMemory = new AtomicLong(0L)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasks.increment()
    if (e.reason != org.apache.spark.Success) failedTasks.increment()
    val m = e.taskMetrics
    if (m != null) {
      recordsRead.add(m.inputMetrics.recordsRead)
      recordsWritten.add(m.outputMetrics.recordsWritten)
      shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
      spillBytes.add(m.diskBytesSpilled)
      executorCpuNanos.add(m.executorCpuTime)
      peakMemory.updateAndGet(p => math.max(p, m.peakExecutionMemory))
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()

  def snapshotJson: String =
    s"""{"tasks":${tasks.sum},"failed_tasks":${failedTasks.sum},
       |"records_read":${recordsRead.sum},"records_written":${recordsWritten.sum},
       |"shuffle_read_bytes":${shuffleReadBytes.sum},"shuffle_write_bytes":${shuffleWriteBytes.sum},
       |"spill_bytes":${spillBytes.sum},"executor_cpu_sec":${executorCpuNanos.sum / 1e9},
       |"peak_execution_memory":${peakMemory.get}}""".stripMargin.replace("\n", "")
}

object MetricsListener {
  /** Run `body` with a listener attached; returns (result, metricsJson). */
  def around[T](spark: org.apache.spark.sql.SparkSession)(body: => T): (T, String) = {
    val l = new MetricsListener
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // drain queued listener events before snapshotting
      org.apache.spark.graftaccess.ListenerBusAccess.waitUntilEmpty(spark.sparkContext)
      (r, l.snapshotJson)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
