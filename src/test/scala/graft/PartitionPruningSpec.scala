package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partition pruning: a date-partitioned parquet layout read with a
  * partition predicate must scan only the matching directories — at
  * 100 TB this is the difference between reading a day and reading the
  * lake. Asserted via PartitionFilters + the file count actually read.
  */
class PartitionPruningSpec extends SparkSpec {

  test("dpp_join: the fact scan carries a dynamic partition-pruning subquery") {
    // same shape as Lake.dppJoin (which cleans up its temp tree before
    // returning, so the plan is rebuilt here for inspection)
    val tmp = Files.createTempDirectory("graft-dpp-spec").toString
    try {
      val ev = graft.tables.Tables.events(spark, sfDir).select(
        expr("unix_millis(ts) div 86400000").as("day"),
        col("event_type"))
      ev.write.mode("overwrite").partitionBy("day").parquet(tmp)
      val fact = spark.read.parquet(tmp)
      val dim = ev.filter(col("event_type") === "purchase")
        .groupBy("day").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), col("day")).limit(3)
        .select(col("day").cast("int").as("day"))
      val df = fact.join(broadcast(dim), "day").groupBy("day").count()
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("dynamicpruning"),
        s"fact partition scan carries no DPP subquery:\n${p.take(2000)}")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(java.nio.file.Paths.get(tmp))
      try walk.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("date-partitioned write + partition-filtered read prunes directories") {
    val tmp = Files.createTempDirectory("graft-part").toString
    val events = graft.tables.Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    events.write.mode("overwrite").partitionBy("day").parquet(s"$tmp/events")

    val days = events.select("day").distinct().count()
    assert(days > 5, s"fixture spans $days days; need multiple partitions")

    val oneDay = spark.read.parquet(s"$tmp/events")
      .filter(col("day") === "2024-01-03")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no partition filter:\n$plan")

    // pruned scan must touch only the one partition's files
    val scanned = oneDay.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("day=2024-01-03")),
      s"scan read outside the partition: ${scanned.take(3).mkString(",")}")

    // and the values round-trip
    val expect = events.filter(col("day") === "2024-01-03").count()
    assert(oneDay.count() == expect)
  }

  test("partitioned_roundtrip's range read prunes to the 3 matching day dirs") {
    // the exact read shape of the driver query (explicit schema keeps
    // `day` a string; BETWEEN on the partition column)
    val tmp = Files.createTempDirectory("graft-part-rt").toString
    val events = graft.tables.Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    events.write.mode("overwrite").partitionBy("day").parquet(tmp)

    val filtered = spark.read.schema(events.schema).parquet(tmp)
      .filter(col("day").between("2024-01-02", "2024-01-04"))
    filtered.collect()

    // directory-level pruning: only the 3 matching day= dirs are opened
    val dirs = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0).split("/").takeWhile(!_.endsWith(".parquet")).last)
      .toSet
    assert(dirs == Set("day=2024-01-02", "day=2024-01-03", "day=2024-01-04"),
      s"scan touched: $dirs")

    // InputPartition count: the scan's own partition-read metric agrees
    val scan = filtered.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.isDefined, "no FileSourceScanExec leaf found")
    scan.get.metrics.get("numPartitions").foreach(m =>
      assert(m.value == 3, s"scan read ${m.value} partitions, wanted 3"))

    // and the driver query's aggregation equals the direct computation
    val got = graft.ops.Relational.partitionedRoundtrip(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = events.filter(col("day").between("2024-01-02", "2024-01-04"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.TextFunctions.cents(col("value"))).as("sum_value_cents"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.nonEmpty && got == want)
  }

  /** The end-to-end z-order claim on REAL files: write the events grid
    * twice as 16 range-partitioned, sorted parquet files (one sorted by
    * the Morton code, one by (x, y)), probe each with a single-dimension
    * box filter, and read the pruning off the SCAN's own metrics — the
    * parquet reader drops whole row groups whose footer min/max misses
    * the pushed predicate, so the scan's numOutputRows IS the row count
    * of the files actually decoded. `zorder_layout` (the driver query)
    * stays the hash-checked math oracle over simulated tiles; this spec
    * is the physical proof the layout pays off at the file level. */
  test("real z-order file layout prunes scans on BOTH dimensions; linear only leading") {
    val tmp = Files.createTempDirectory("graft-zorder-files").toString
    val pts = graft.tables.Tables.events(spark, sfDir).select(
      col("event_id"),
      datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("x"),
      least(lit(30L), floor(col("value") / 16).cast("long")).as("y"))
      .withColumn("z", graft.functions.LayoutFunctions.zorder(col("x"), col("y")))
    pts.repartitionByRange(16, col("z"), col("event_id"))
      .sortWithinPartitions("z", "event_id")
      .write.mode("overwrite").parquet(s"$tmp/zorder")
    pts.repartitionByRange(16, col("x"), col("y"), col("event_id"))
      .sortWithinPartitions("x", "y", "event_id")
      .write.mode("overwrite").parquet(s"$tmp/linear")
    val total = pts.count()

    // rows the parquet reader actually decoded (post row-group pruning)
    def scannedRows(dir: String, probe: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(dir).filter(probe)
      val result = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("PushedFilters: [IsNotNull"),
        s"probe not pushed to the scan:\n$plan")
      val scan = plan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScanExec leaf"))
      (scan.metrics("numOutputRows").value, result)
    }

    val yProbe = col("y").between(8L, 11L)
    val xProbe = col("x").between(3L, 5L)
    val (zY, zYres)     = scannedRows(s"$tmp/zorder", yProbe)
    val (linY, linYres) = scannedRows(s"$tmp/linear", yProbe)
    val (zX, _)         = scannedRows(s"$tmp/zorder", xProbe)
    val (linX, _)       = scannedRows(s"$tmp/linear", xProbe)

    assert(zYres == linYres, "both layouts must return identical probe results")
    // the y-only probe: the x-sorted layout decodes ~everything, the
    // z-order layout bounds y per file and skips most row groups
    assert(linY > (total * 8) / 10, s"linear y-probe decoded $linY of $total")
    assert(zY * 2 < linY, s"z-order y-probe decoded $zY vs linear $linY")
    // the leading-dimension probe: both layouts prune
    assert(zX * 2 < total, s"z-order x-probe decoded $zX of $total")
    assert(linX * 2 < total, s"linear x-probe decoded $linX of $total")
  }
}
