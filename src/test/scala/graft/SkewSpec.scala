package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation produces the same totals as a direct groupBy on a
  * deliberately skewed dataset (one key holding ~90% of rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed join partition (skew=true in the final plan)") {
    // salting covers skewed AGGREGATIONS (above); skewed JOINS are
    // Spark's own job — AQE detects the oversized shuffle partition at
    // runtime and splits it across tasks. Thresholds are lowered so the
    // test-sized hot key (~90% of rows, padded payload) trips the same
    // detection a hot key trips at 100 TB.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // no broadcast (force the shuffled join skew handling applies to)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")

      val left = spark.range(0, 100000).select(
        when(col("id") % 10 === 0, col("id") % 50 + 1).otherwise(lit(0L)).as("k"),
        rpad(col("id").cast("string"), 128, "x").as("payload"))
      val right = spark.range(0, 51).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")

      // collect() (not count()) so the action runs THIS queryExecution —
      // count() plans its own tree and the inspected plan would stay
      // unexecuted (isFinalPlan=false, no skew re-plan to see).
      // Row-count check: the split must not duplicate or drop rows.
      assert(joined.collect().length == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot join partition as skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedJoin rejects zero buckets and inputs already carrying __salt") {
    val fact = Seq((1L, "a")).toDF("k", "x")
    val dim  = Seq((1L, "d")).toDF("k", "y")
    intercept[IllegalArgumentException](Skew.saltedJoin(fact, dim, "k", col("x"), 0))
    intercept[IllegalArgumentException](Skew.saltedSumCount(fact, col("k"), col("k"), col("x"), 0))
    val poisoned = fact.withColumn("__salt", lit(1L))
    intercept[IllegalArgumentException](Skew.saltedJoin(poisoned, dim, "k", col("x"), 4))
    intercept[IllegalArgumentException](Skew.saltedJoin(fact, poisoned, "k", col("x"), 4))
  }

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

  test("salted join equals the plain join under a hot key and spreads every bucket") {
    import spark.implicits._
    // one key carries 96% of the fact table
    val fact = ((1L to 4800L).map(i => ("hot", i)) ++ (1L to 200L).map(i => ("cold", -i)))
      .toDF("k", "id")
    val dim = Seq(("hot", 1L), ("cold", 2L)).toDF("k", "attr")
    val plain = fact.join(dim, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", col("id"), buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(!Skew.saltedJoin(fact, dim, "k", col("id"), 8).columns.contains("__salt"))
    // the hot key must actually occupy all 8 buckets, or nothing was gained
    val spread = fact.filter(col("k") === "hot")
      .select(pmod(xxhash64(col("id")), lit(8))).distinct().count()
    assert(spread == 8)
  }
}
