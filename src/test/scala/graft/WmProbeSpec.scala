package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Pins the engine's TWO-watermark model (SPARK-42376) that
  * `stream_late_drops` depends on: a micro-batch filters LATE input
  * against the PREVIOUS batch's watermark while state EVICTION uses the
  * current one. Consequence, proven here end-to-end on the real file
  * source: the batch immediately after the data that advanced the
  * watermark still ACCEPTS late rows (its late-filter watermark is one
  * batch stale); only a batch after a committed "carrier" batch drops
  * them. If a Spark upgrade collapses the two watermarks back into
  * one, these tests — not the oracle gate — are designed to fail
  * first. */
class WmProbeSpec extends SparkSpec {

  private def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  /** run update-mode 1h-window counts over mtime-ordered staged files,
    * one file per micro-batch; returns (hour-of-window, n) rows. */
  private def runStaged(name: String, files: Seq[Seq[(java.sql.Timestamp, String)]])
      : Seq[(Long, Long)] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("wmprobe").toString
    files.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("ts", "k").coalesce(1).write.parquet(s"$tmp/s$i")
      val part = new java.io.File(s"$tmp/s$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$tmp/src/f$i.parquet")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    val src = spark.readStream.schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/src")
    val agg = src.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    try spark.table(name).collect()
      .map(r => (r.getLong(0) / 3600000 % 24, r.getLong(1))).toSeq.sorted
    finally { spark.catalog.dropTempView(name); () }
  }

  private val onTime = Seq((ts(1, 0), "a"), (ts(1, 30), "a"), (ts(10, 0), "a"))
  private val late   = Seq((ts(1, 45), "a"), (ts(9, 55), "a"))

  test("without a carrier batch, the one-batch-stale late filter accepts everything") {
    val rows = runStaged("wmp_two", Seq(onTime, late))
    // watermark advanced to 09:50 after batch 0, but batch 1 filters
    // against the PRE-batch-0 watermark (0) — both late rows accepted
    assert(rows == Seq((1L, 2L), (1L, 3L), (9L, 1L), (10L, 1L)), rows.toString)
  }

  test("a committed carrier batch arms the late filter; stale rows drop") {
    val rows = runStaged("wmp_three", Seq(onTime, Seq((ts(10, 5), "a")), late))
    // batch 2's late filter = watermark after batch 1 = 09:50: the
    // 01:45 row (window end 02:00 <= W) drops — hour-1 never re-emits;
    // the 09:55 row (window end 10:00 > W) is accepted
    assert(rows == Seq((1L, 2L), (9L, 1L), (10L, 1L), (10L, 2L)), rows.toString)
  }
}
