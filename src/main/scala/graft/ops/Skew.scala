package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling: two-phase salted aggregation. For a groupBy whose key
  * distribution is heavily skewed (one hot key → one straggler
  * partition), aggregate first on (key, salt) — spreading the hot key
  * over `buckets` partitions — then re-aggregate on key. Works for any
  * algebraic aggregate (sum/count/min/max); AQE's skew handling covers
  * joins, this covers aggregations whose single hot group would
  * otherwise serialize.
  */
object Skew {

  /** sum+count per key, salted. `saltOn` must be deterministic per row
    * (a hash of any column set) so re-runs are stable. */
  def saltedSumCount(
      df: DataFrame, key: Column, value: Column, saltOn: Column, buckets: Int): DataFrame = {
    val salted = df.select(
      key.as("k"),
      value.as("v"),
      pmod(xxhash64(saltOn), lit(buckets)).as("salt"))
    salted
      .groupBy("k", "salt")
      .agg(sum("v").as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy("k")
      .agg(sum("partial_sum").as("total"), sum("partial_cnt").as("cnt"))
  }
}
