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
}
