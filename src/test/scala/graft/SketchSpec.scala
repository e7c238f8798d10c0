package graft

import graft.functions.SketchFunctions
import org.apache.spark.sql.functions._

/** KMV distinct sketch (custom TypedImperativeAggregate): exact below
  * k, plan-shape invariant, and a real estimator above k.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv is exact below k distinct values") {
    val df = (1L to 500L).map(i => (i % 7, i % 250)).toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(SketchFunctions.kmvDistinct(col("v"), 1024).as("kmv"),
        countDistinct(col("v")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"group ${r.get(0)}"))
  }

  test("kmv is invariant to partitioning and merge shape") {
    val df = (1L to 20000L).map(i => i * 2654435761L % 100000L).toDF("v")
    def est(parts: Int): Long = df.repartition(parts)
      .agg(SketchFunctions.kmvDistinct(col("v"), 256).as("kmv"))
      .head().getLong(0)
    val e1 = est(1)
    assert(e1 == est(7) && e1 == est(32), "estimate must not depend on the plan")
  }

  test("kmv estimates within 5 rsd above k") {
    val k  = 256
    val df = (1L to 50000L).toDF("v")
    val est = df.agg(SketchFunctions.kmvDistinct(col("v"), k)).head().getLong(0)
    val exact = 50000.0
    val rsd   = 1.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - exact) <= 5 * rsd * exact,
      s"est=$est exact=$exact bound=${5 * rsd * exact}")
  }

  test("kmv ignores nulls like COUNT(DISTINCT)") {
    val df = Seq(Some(1L), Some(2L), None, Some(2L), None).toDF("v")
    val got = df.agg(SketchFunctions.kmvDistinct(col("v"), 64)).head().getLong(0)
    assert(got == 2L)
  }
}
