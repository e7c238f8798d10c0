package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partition pruning: a date-partitioned parquet layout read with a
  * partition predicate must scan only the matching directories — at
  * 100 TB this is the difference between reading a day and reading the
  * lake. Asserted via PartitionFilters + the file count actually read.
  */
class PartitionPruningSpec extends SparkSpec {

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
}
