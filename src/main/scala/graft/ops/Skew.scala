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
    require(buckets > 0, s"saltedSumCount needs buckets > 0 (got $buckets): pmod by 0 yields null keys")
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

  /** Salted equi-join — the manual skew fallback for when AQE's
    * runtime skew split cannot apply (deterministic plan required, or
    * the skew sits on the build side of a shuffled-hash join): fact
    * rows salt their key over `buckets` and the dim side replicates
    * each row once per bucket, so the join key becomes (key, salt) and
    * the hot key's rows spread over `buckets` tasks instead of
    * serializing in one. Output is identical to the unsalted join
    * (every fact row still meets every dim row of its key exactly
    * once); the cost is a `buckets`× dim-side shuffle — the standard
    * trade, cheap when dim ≪ fact, which is exactly the skewed-join
    * case that hurts. `saltOn` must be deterministic per row. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltOn: Column, buckets: Int): DataFrame = {
    require(buckets > 0,
      s"saltedJoin needs buckets > 0 (got $buckets): pmod by 0 nulls every key and an empty explode drops all dim rows")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the __salt column; an input already carrying one would collide with the join key")
    val sf = fact.withColumn("__salt", pmod(xxhash64(saltOn), lit(buckets)))
    val sd = dim.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    sf.join(sd, Seq(key, "__salt")).drop("__salt")
  }
}
