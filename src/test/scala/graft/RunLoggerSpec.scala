package graft

import graft.kernel.RunLogger
import java.nio.file.{Files, Paths}

/** The run log captures job/task lifecycle in the reference's shape. */
class RunLoggerSpec extends SparkSpec {
  import spark.implicits._

  test("run log records run start, task lifecycle and duration") {
    val path = Files.createTempFile("graft-runlog", ".log").toString
    val logger = RunLogger.attach(spark, path)
    try {
      spark.createDataset(1 to 100).map(_ * 2).repartition(2).count()
      org.apache.spark.graftbridge.SchedulerBridge.drainListeners(spark.sparkContext)
      logger.flush()
      val content = Files.readString(Paths.get(path))
      assert(content.contains("runMapReduceFramework started"))
      assert(content.contains("Thread ExecTask"))
      assert(content.contains("terminated"))
      assert(content.matches("(?s).*Job \\d+ took \\d+ ns.*"))
      assert(content.contains("runMapReduceFramework finished"))
    } finally {
      spark.sparkContext.removeSparkListener(logger)
      Files.deleteIfExists(Paths.get(path))
    }
  }

  test("faithful mode emits the reference's exact line formats (O13, PDF p.10)") {
    val path = Files.createTempFile("graft-runlog-ref", ".log").toString
    val logger = RunLogger.attach(spark, path, faithful = true)
    try {
      // two-stage job: shuffle-map stage (ExecMap) + result stage (ExecReduce)
      spark.createDataset(1 to 100).map(x => (x % 5, x)).groupByKey(_._1).count().collect()
      org.apache.spark.graftbridge.SchedulerBridge.drainListeners(spark.sparkContext)
      logger.flush()
      val lines = Files.readString(Paths.get(path)).linesIterator.toSeq

      // every reference line form, verbatim (MapReduceFramework.cpp:
      // header :692-694, timeStamp :155-182, footer :752-761)
      val stamp = "\\[\\d{2}\\.\\d{2}\\.\\d{4} \\d{2}:\\d{2}:\\d{2}\\]"
      assert(lines.exists(_.matches("runMapReduceFramework started with \\d+ threads")))
      assert(lines.exists(_.matches(s"Thread ExecMap created $stamp")))
      assert(lines.exists(_.matches(s"Thread ExecMap terminated $stamp")))
      assert(lines.exists(_.matches(s"Thread ExecReduce created $stamp")))
      assert(lines.exists(_.matches(s"Thread ExecReduce terminated $stamp")))
      assert(lines.exists(_.matches(s"Thread Shuffle created $stamp")))
      assert(lines.exists(_.matches(s"Thread Shuffle terminated $stamp")))
      assert(lines.exists(_.matches("Map and Shuffle took \\d+ ns")))
      assert(lines.exists(_.matches("Reduce took \\d+ ns")))
      assert(lines.contains("runMapReduceFramework finished"))
      // no non-reference line forms leak into faithful output
      assert(!lines.exists(_.contains("ExecTask")))
      assert(!lines.exists(_.matches("Job \\d+ took.*")))
    } finally {
      spark.sparkContext.removeSparkListener(logger)
      Files.deleteIfExists(Paths.get(path))
    }
  }

  test("faithful summary reproduces the reference's swapped duration labels") {
    // MapReduceFramework.cpp:752-758: MapShuffleTime is emitted under
    // "Reduce took", the reduce-phase time under "Map and Shuffle took"
    val lines = RunLogger.faithfulSummary(mapShuffleNs = 111L, reduceNs = 222L)
    assert(lines == Seq("Map and Shuffle took 222 ns", "Reduce took 111 ns"))
  }
}
