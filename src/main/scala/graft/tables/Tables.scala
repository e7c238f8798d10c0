package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All reads go through here so that schema quirks are handled once:
  *  - `events.ts` has shipped in two encodings across fixture
  *    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
  *    reader only supports as a raw long via `spark.sql.legacy.parquet.
  *    nanosAsLong`) and parquet timestamp[us] with isAdjustedToUTC=false
  *    (which Spark reads as TIMESTAMP_NTZ). [[Tables.normalizeTs]]
  *    branches on the type Spark actually inferred and converts both to
  *    a proper TimestampType (micros) so downstream operators see one
  *    stable schema regardless of how the driver regenerated the files.
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

  /** Rewrites a `ts` column of any fixture-observed encoding to
    * TimestampType micros. The session timezone is pinned to UTC by
    * Bench/Verify/spec sessions, so the NTZ→TZ cast is a pure
    * reinterpretation (epoch values unchanged) and stays aligned with
    * the DuckDB oracle, which reads the same naive-micros parquet.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    // The NTZ→TZ cast below is a pure reinterpretation ONLY under a UTC
    // session timezone; any other zone silently shifts every epoch. All
    // current entry points (Bench/Verify/specs) pin UTC — enforce it
    // here so a future caller can't quietly diverge from the oracle.
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"Tables.normalizeTs requires spark.sql.session.timeZone=UTC (got $tz): " +
        "the TIMESTAMP_NTZ cast reinterprets naive micros and would shift epochs")
    df.schema("ts").dataType match {
      // TIMESTAMP(NANOS) read as raw long under nanosAsLong: integer
      // division keeps full precision (ns values exceed 2^53, so a
      // double-based divide would corrupt timestamps).
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ.
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType =>
        df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected long (nanos), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  /** `events` with `ts` normalized to TimestampType micros regardless of
    * the fixture's on-disk encoding (see [[normalizeTs]]).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Harmless for micros fixtures; required so a TIMESTAMP(NANOS)
    // fixture surfaces as LongType instead of failing the scan.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(path(dir, "events")))
  }

  /** The streaming twin of [[events]]: same nanos conf, same schema
    * branch, same micros conversion — one normalization definition so
    * the bounded-stream queries can never diverge from the batch
    * oracle's read contract. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path(dir, "events")).schema
    normalizeTs(
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }
}
