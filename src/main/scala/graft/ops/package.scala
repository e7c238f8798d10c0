package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {

  /** One driver-contract query: a Spark implementation plus (when the
    * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
    * the same parquet tables. Queries without an oracle get the driver's
    * weaker rows-only check.
    */
  final case class QueryDef(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object QueryDef {
    def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
      QueryDef(name, fn, Some(oracle))
    def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
      QueryDef(name, fn, None)
  }
}
