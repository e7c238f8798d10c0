package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All reads go through here so that schema quirks are handled once:
  *  - `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
  *    reader only supports as a raw long (`spark.sql.legacy.parquet.
  *    nanosAsLong`); we convert to a proper TimestampType (micros,
  *    floor-truncated exactly like DuckDB does) so downstream operators
  *    see a normal timestamp column.
  *
  * Scale note: these are plain columnar parquet scans — filter pushdown
  * and column pruning reach the scan, and at cluster scale the same code
  * reads a partitioned directory tree instead of a single file.
  */
object Tables {

  val star: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case other    => spark.read.parquet(path(dir, other))
    }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` with `ts` as TimestampType (micros, floor(ns/1000) — same
    * truncation DuckDB applies when reading TIMESTAMP(NANOS) parquet).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    // integer division keeps full precision (ns values exceed 2^53, so a
    // double-based divide would corrupt timestamps).
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** The streaming twin of [[events]]: same nanos conf, same schema,
    * same micros conversion — one definition so the bounded-stream
    * queries can never diverge from the batch oracle's read contract. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path(dir, "events")).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
