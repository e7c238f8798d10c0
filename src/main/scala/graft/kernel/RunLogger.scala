package graft.kernel

import java.io.{File, FileWriter, PrintWriter}
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Observability parity with the reference's run log (O13,
  * `MapReduceFramework.cpp:118-182,685-694,752-761`; format spec
  * `MapReduceEX.pdf` p.10): a run header with the worker count, a line
  * per worker-unit start/finish, and the two phase durations.
  *
  * Spark equivalent: a SparkListener — tasks play the role of the
  * reference's threads, jobs the role of runs.
  *
  * Two formats:
  *
  *  - default (`faithful = false`): structured lines with task ids and
  *    ISO timestamps — what you'd actually want in production.
  *  - `faithful = true`: byte-level parity with the reference's
  *    `.MapReduceFramework.log`. Tasks of a job's final (result) stage
  *    log as `ExecReduce`, all earlier stages as `ExecMap`, and one
  *    `Shuffle` worker brackets the job (the reference spawns exactly
  *    one shuffler alongside the mappers,
  *    `MapReduceFramework.cpp:726-727`). Timestamps use the reference's
  *    `[dd.MM.yyyy HH:mm:ss]` local-time stamp
  *    (`MapReduceFramework.cpp:155-182`). The reference swaps the two
  *    duration labels at its emit site — `MapShuffleTime` is printed
  *    under "Reduce took" (`MapReduceFramework.cpp:756-758`) — and
  *    faithful mode reproduces that bug, see
  *    [[RunLogger.faithfulSummary]].
  */
final class RunLogger private[kernel] (
    logPath: String, faithful: Boolean = false, threads: Int = 0)
    extends SparkListener {

  private val lines = new ConcurrentLinkedQueue[String]()
  // per-job start times: overlapping jobs (parallel actions, AQE
  // sub-jobs) must not clobber each other's durations
  private val jobStartNs = new ConcurrentHashMap[Int, java.lang.Long]()
  // faithful mode: stageId -> (jobId, isReduce). A stage that feeds a
  // shuffle (shuffleDepId defined) is a map stage — its tasks produce
  // shuffle output like the reference's ExecMap threads feed the
  // shuffler; a result stage consumes grouped data like ExecReduce.
  // (Robust under AQE, which runs each stage as its own job — a
  // "final stage of the job" heuristic is not.)
  private val stageRole = new ConcurrentHashMap[Int, (Int, Boolean)]()
  // faithful mode: first reduce-task start per job — the map/reduce
  // phase boundary (the reference's barrier between joinWorkers(MAPPER)
  // and createWorkers(REDUCER), MapReduceFramework.cpp:729-744)
  private val reduceStartNs = new ConcurrentHashMap[Int, java.lang.Long]()

  private def now(): String = java.time.Instant.now().toString

  private def refStamp(): String =
    java.time.LocalDateTime.now().format(RunLogger.RefStampFmt)

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    jobStartNs.put(jobStart.jobId, System.nanoTime())
    if (faithful) {
      // putIfAbsent: a stage shared by overlapping jobs (common shuffle
      // dependency) stays owned by its first job — overwriting would let
      // the second job's cleanup delete it mid-flight
      jobStart.stageInfos.foreach(si =>
        stageRole.putIfAbsent(si.stageId,
          (jobStart.jobId, org.apache.spark.graftbridge.SchedulerBridge.shuffleDepId(si).isEmpty)))
      lines.add(s"runMapReduceFramework started with $threads threads")
      lines.add(s"Thread Shuffle created [${refStamp()}]")
    } else {
      lines.add(s"runMapReduceFramework started with ${jobStart.stageInfos.map(_.numTasks).sum} tasks")
    }
  }

  private def workerType(stageId: Int): String =
    stageRole.get(stageId) match {
      case null         => "ExecMap"
      case (_, isRed)   => if (isRed) "ExecReduce" else "ExecMap"
    }

  override def onTaskStart(taskStart: SparkListenerTaskStart): Unit =
    if (faithful) {
      val role = stageRole.get(taskStart.stageId)
      if (role != null && role._2) reduceStartNs.putIfAbsent(role._1, System.nanoTime())
      lines.add(s"Thread ${workerType(taskStart.stageId)} created [${refStamp()}]")
    } else {
      lines.add(s"Thread ExecTask ${taskStart.taskInfo.taskId} created [${now()}]")
    }

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
    if (faithful) {
      lines.add(s"Thread ${workerType(taskEnd.stageId)} terminated [${refStamp()}]")
    } else {
      lines.add(s"Thread ExecTask ${taskEnd.taskInfo.taskId} terminated [${now()}]")
    }

  override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit = {
    val endNs = System.nanoTime()
    val start = jobStartNs.remove(jobEnd.jobId)
    if (faithful) {
      lines.add(s"Thread Shuffle terminated [${refStamp()}]")
      val startNs = if (start == null) endNs else start.longValue()
      val redStart = reduceStartNs.remove(jobEnd.jobId)
      // single-stage job: the whole run is the "map" phase, reduce = 0
      val boundary = if (redStart == null) endNs else redStart.longValue()
      RunLogger.faithfulSummary(boundary - startNs, endNs - boundary).foreach(lines.add)
      stageRole.entrySet().removeIf(e => e.getValue._1 == jobEnd.jobId)
    } else {
      val tookNs = if (start == null) -1L else endNs - start.longValue()
      lines.add(s"Job ${jobEnd.jobId} took $tookNs ns")
    }
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

  /** the reference's `timeStamp` format: `dd.MM.yyyy HH:mm:ss`, local
    * time, zero-padded (`MapReduceFramework.cpp:168-180`). */
  private[kernel] val RefStampFmt =
    java.time.format.DateTimeFormatter.ofPattern("dd.MM.yyyy HH:mm:ss")

  /** the reference's closing duration lines — WITH its label swap: the
    * map+shuffle duration is printed under "Reduce took" and vice versa
    * (`MapReduceFramework.cpp:752-758`: `MapShuffleTime` goes to the
    * "Reduce took" line). Factored out so the spec can pin the swap. */
  private[graft] def faithfulSummary(mapShuffleNs: Long, reduceNs: Long): Seq[String] =
    Seq(
      s"Map and Shuffle took $reduceNs ns",
      s"Reduce took $mapShuffleNs ns")

  /** attach a run log (appending, like the reference's
    * `.MapReduceFramework.log`). `faithful = true` switches to the
    * reference's exact line format (O13 byte parity). */
  def attach(spark: SparkSession, logPath: String, faithful: Boolean = false): RunLogger = {
    val l = new RunLogger(logPath, faithful, spark.sparkContext.defaultParallelism)
    spark.sparkContext.addSparkListener(l)
    l
  }
}
