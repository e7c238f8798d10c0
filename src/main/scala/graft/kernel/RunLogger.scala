package graft.kernel

import java.io.{File, FileWriter, PrintWriter}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Observability parity with the reference's run log (O13,
  * `MapReduceFramework.cpp:118-182,685-694,752-761`; format spec
  * `MapReduceEX.pdf` p.10): a run header with the worker count, a line
  * per worker-unit start/finish, and the two phase durations.
  *
  * Spark equivalent: a SparkListener — tasks play the role of the
  * reference's threads, jobs the role of runs. (The reference swaps the
  * two duration labels at its emit site, `MapReduceFramework.cpp:756-758`;
  * we do not reproduce the bug.)
  */
final class RunLogger(logPath: String) extends SparkListener {

  private val lines = new ConcurrentLinkedQueue[String]()
  // per-job start times: overlapping jobs (parallel actions, AQE
  // sub-jobs) must not clobber each other's durations
  private val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()

  private def now(): String = java.time.Instant.now().toString

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    jobStartNs.put(jobStart.jobId, System.nanoTime())
    lines.add(s"runMapReduceFramework started with ${jobStart.stageInfos.map(_.numTasks).sum} tasks")
  }

  override def onTaskStart(taskStart: SparkListenerTaskStart): Unit =
    lines.add(s"Thread ExecTask ${taskStart.taskInfo.taskId} created [${now()}]")

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
    lines.add(s"Thread ExecTask ${taskEnd.taskInfo.taskId} terminated [${now()}]")

  override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit = {
    val start = jobStartNs.remove(jobEnd.jobId)
    val tookNs = if (start == null) -1L else System.nanoTime() - start.longValue()
    lines.add(s"Job ${jobEnd.jobId} took $tookNs ns")
    lines.add("runMapReduceFramework finished")
    flush()
  }

  def flush(): Unit = synchronized {
    val out = new PrintWriter(new FileWriter(new File(logPath), true))
    try {
      var line = lines.poll()
      while (line != null) { out.println(line); line = lines.poll() }
    } finally out.close()
  }
}

object RunLogger {
  /** attach a run log (appending, like the reference's `.MapReduceFramework.log`). */
  def attach(spark: SparkSession, logPath: String): RunLogger = {
    val l = new RunLogger(logPath)
    spark.sparkContext.addSparkListener(l)
    l
  }
}
