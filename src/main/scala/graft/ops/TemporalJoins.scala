package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval joins the reference lacks (SURVEY §2.3 "joins:
  * absent, derivable"), built in their scalable forms:
  *
  * - as-of join: "for each event, the most recent signup of the same
  *   user at or before it". Implemented as union + one windowed running
  *   max — a single shuffle on (user_id), NO per-row range probe and no
  *   quadratic explosion; this is the standard sort-based as-of shape
  *   (what a dedicated AsOfJoinExec would do internally). Verified
  *   against DuckDB's *native* ASOF JOIN.
  *
  * - range join: fact rows matched to a small interval dimension
  *   (price bands) — broadcast nested-loop with a range predicate, the
  *   right plan when the build side is tiny; verified against a plain
  *   BETWEEN join.
  */
object TemporalJoins {

  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val leftRows = e.select(
      col("user_id"), col("ts"), lit(1).as("tag"), col("event_id"),
      lit(null).cast("timestamp").as("s_ts"))
    val rightRows = e.filter(col("event_type") === "signup").select(
      col("user_id"), col("ts"), lit(0).as("tag"),
      lit(null).cast("long").as("event_id"), col("ts").as("s_ts"))
    // at equal ts the signup row sorts first (tag 0) → inclusive match,
    // exactly DuckDB's e.ts >= s.ts semantics.
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftRows.union(rightRows)
      .withColumn("last_signup", max(col("s_ts")).over(w)) // s_ts monotone in w ⇒ max = latest
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        // -1 sentinel: a nullable BIGINT degrades to float64+NaN in
        // arrow/pandas readers, making hash compares representation-
        // dependent; keep the column non-null
        coalesce(unix_millis(col("last_signup")), lit(-1L)).as("last_signup_ms"))
      .orderBy("event_id")
  }

  /** tiny interval dimension, constructed inline (deterministic). */
  private val bands: Seq[(Long, Double, Double, String)] = Seq(
    (1L, 0.0, 20000.0, "low"),
    (2L, 20000.0, 50000.0, "mid"),
    (3L, 50000.0, 1e9, "high"))

  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = bands.toDF("band_id", "lo", "hi", "label")
    Tables.orders(spark, dir)
      .join(broadcast(dim),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band_id", "label")
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.TextFunctions.cents(col("o_totalprice"))).as("sum_cents"))
      .orderBy("band_id")
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef.sql("asof_join",
      """SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
        |       coalesce(epoch_ms(s.ts), -1) AS last_signup_ms
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY event_id""".stripMargin)(asofJoin),
    QueryDef.sql("range_join",
      """SELECT CAST(band_id AS BIGINT) AS band_id, label, count(*) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders JOIN (VALUES
        |    (1, 0.0, 20000.0, 'low'),
        |    (2, 20000.0, 50000.0, 'mid'),
        |    (3, 50000.0, 1000000000.0, 'high')) AS bands(band_id, lo, hi, label)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band_id, label ORDER BY band_id""".stripMargin)(rangeJoin),
  )
}
