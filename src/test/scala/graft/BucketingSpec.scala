package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed tables co-locate join keys at write time: a join between two
  * tables bucketed on the key needs NO shuffle exchange — the 100 TB
  * answer to repeated fact-fact joins. Asserted on the executed plan.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (only the final
      // aggregation exchanges on o_orderstatus)
      val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").last
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("merge hint keeps a small bucketed dim on the exchange-free SMJ path") {
    // the bucketed_join query's shape: customer is small enough that
    // the planner would broadcast (skipping the bucketed layout); the
    // MERGE hint must force the shuffle-free bucketed SortMergeJoin
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    o.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_bh")
    c.write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_bh")
    try {
      val joined = spark.table("orders_bh")
        .join(spark.table("customer_bh").hint("merge"),
          col("o_custkey") === col("c_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"hint ignored, plan:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed sides still shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bh")
      spark.sql("DROP TABLE IF EXISTS customer_bh")
    }
  }
}
