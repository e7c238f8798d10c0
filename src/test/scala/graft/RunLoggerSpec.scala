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
      // listener bus is async; give it a moment to drain
      Thread.sleep(1500)
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
}
