package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed custom aggregation (the reference's Reduce-as-UDAF surface,
  * SURVEY §2.3 "UDF/UDAF/UDTF"): an `Aggregator[IN, BUF, OUT]` computing
  * per-label embedding centroids in one pass — mutable primitive-array
  * buffer, partial merge on executors (map-side combine), the shape a
  * distributed k-means/IVF coarse-quantizer step uses at 100 TB.
  *
  * Output is exploded to (label, dim, round(avg,6)) so a plain SQL
  * AVG-per-dimension oracle can hash-match it (rounding absorbs
  * float-sum association differences across partitionings).
  */
object Centroids {

  final case class LabeledVec(label: Int, embedding: Array[Float])
  final case class CentroidBuf(var sums: Array[Double], var n: Long)

  class CentroidAgg(dim: Int) extends Aggregator[LabeledVec, CentroidBuf, Array[Double]] {
    override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)
    override def reduce(b: CentroidBuf, v: LabeledVec): CentroidBuf = {
      var i = 0
      while (i < dim && i < v.embedding.length) { b.sums(i) += v.embedding(i); i += 1 }
      b.n += 1
      b
    }
    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      a.n += b.n
      a
    }
    override def finish(b: CentroidBuf): Array[Double] =
      if (b.n == 0) b.sums else b.sums.map(_ / b.n)
    override def bufferEncoder: Encoder[CentroidBuf]  = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = 64
    val ds = Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding")).as[LabeledVec]
    ds.groupByKey(_.label)
      .agg(new CentroidAgg(dim).toColumn.name("centroid"))
      .toDF("label", "centroid")
      .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "avg_val")))
      .select(col("label").cast("long").as("label"), col("dim").cast("long").as("dim"),
        round(col("avg_val"), 6).as("avg_val"))
      .orderBy("label", "dim")
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef.sql("label_centroids",
      """SELECT CAST(label AS BIGINT) AS label, CAST(d - 1 AS BIGINT) AS dim,
        |       round(avg(CAST(embedding[d] AS DOUBLE)), 6) AS avg_val
        |FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) dims
        |GROUP BY label, d ORDER BY label, dim""".stripMargin)(labelCentroids),
  )
}
