package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation produces the same totals as a direct groupBy on a
  * deliberately skewed dataset (one key holding ~90% of rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum/count equals direct aggregation under heavy skew") {
    val rows = (1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 17}", i.toLong))
    val df = rows.toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, col("key"), col("v"), col("v"), buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
