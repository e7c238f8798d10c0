package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k via a bounded-heap typed Aggregator. The window
  * row_number form (Parity.groupTopK) sorts every group in full; this
  * one carries at most k elements per partial buffer and merges heaps —
  * the shape that survives groups of billions of rows. Output is
  * identical to the window form, so it shares that oracle.
  */
object TopK {

  final case class Keyed(o_orderpriority: String, o_orderkey: Long, o_totalprice: Double)
  final case class TopBuf(var items: List[(Double, Long)])

  /** keeps the k best (price, key) pairs, "best" = (price desc, key asc)
    * — the window form's ordering exactly; buffers are best-first, never
    * exceed k elements, and the common reduce case (new row worse than
    * the current k-th) is a single comparison, no sort. */
  class TopKAgg(k: Int) extends Aggregator[Keyed, TopBuf, Seq[Keyed]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    /** ordered insert into a best-first list capped at k. */
    private def insert(items: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] =
      if (items.sizeIs >= k && !better(v, items.last)) items
      else {
        val (front, back) = items.span(better(_, v))
        (front ::: v :: back).take(k)
      }

    override def zero: TopBuf = TopBuf(Nil)
    override def reduce(b: TopBuf, v: Keyed): TopBuf = {
      b.items = insert(b.items, (v.o_totalprice, v.o_orderkey))
      b
    }
    override def merge(a: TopBuf, b: TopBuf): TopBuf = {
      a.items = b.items.foldLeft(a.items)(insert)
      a
    }
    override def finish(b: TopBuf): Seq[Keyed] =
      b.items.map { case (p, key) => Keyed("", key, p) }
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[Seq[Keyed]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Keyed]]()
  }

  def groupTopKAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .as[Keyed]
      .groupByKey(_.o_orderpriority)
      .agg(new TopKAgg(3).toColumn.name("top"))
      .toDF("o_orderpriority", "top")
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("o_orderpriority"), col("t.o_orderkey"), col("t.o_totalprice"),
        (col("i") + 1).cast("long").as("rn"))
      .orderBy("o_orderpriority", "rn")
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef.sql("group_topk_agg",
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)(groupTopKAgg),
  )
}
