package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 is a named entry in `queries`;
  * SQL-expressible ones carry a DuckDB oracle in `oracleSql` (the driver
  * hash-compares on sf0.01), the rest get the rows-only check.
  */
object SparkEntry {

  /** All registered query modules. */
  def modules: Seq[Seq[QueryDef]] = Seq(
    Parity.entries,
    Relational.entries,
    Tpch.entries,
    Events.entries,
    TemporalJoins.entries,
    Centroids.entries,
    TopK.entries,
    Dedup.entries,
    Lake.entries,
    Similarity.entries,
    TextAnalysis.entries,
    Stats.entries,
    Curation.entries,
    Graph.entries,
    Multimodal.entries,
  )

  lazy val allQueries: Seq[QueryDef] = modules.flatten

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's `Search` client (substring search, `Search.cpp`).
    */
  def entry(spark: SparkSession): DataFrame =
    Parity.searchContains(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
