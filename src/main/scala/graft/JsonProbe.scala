package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = graft.tables.Tables.events(spark, dir)
    ev.count()
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE $name%-22s ${(System.nanoTime-t0)/1e9}%.2f s")
    }
    val st = StructType(Seq(StructField("k", LongType)))
    time("full_current")(graft.ops.Events.jsonFuncs(spark, dir))
    time("no_orderby")(ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_path"),
      from_json(col("props"), st).getField("k").as("k_struct")))
    time("gjo_only")(ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_path")))
    time("fj_only")(ev.select(col("event_id"),
      from_json(col("props"), st).getField("k").as("k_struct")))
    time("single_parse_both")({ val p = from_json(col("props"), st)
      ev.select(col("event_id"), p.getField("k").as("k_path"), p.getField("k").as("k_struct")) })
    time("map_funcs_ref")(graft.ops.Events.mapFuncs(spark, dir))
    spark.stop()
  }
}
