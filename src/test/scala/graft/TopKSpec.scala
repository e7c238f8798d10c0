package graft

import graft.ops.TopK
import graft.ops.TopK.{Keyed, TopKAgg}
import org.apache.spark.sql.functions._

/** The hand-rolled bounded insert must agree with the window row_number
  * formulation under ties and k-overflow — checked on adversarial data
  * (duplicate prices, groups larger and smaller than k).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals window top-k under price ties") {
    val rows = Seq(
      Keyed("A", 1, 100.0), Keyed("A", 2, 100.0), Keyed("A", 3, 100.0),
      Keyed("A", 4, 100.0), Keyed("A", 5, 50.0),
      Keyed("B", 6, 10.0), Keyed("B", 7, 20.0),
      Keyed("C", 8, 1.0))
    val ds = rows.toDS()
    val viaAgg = ds.groupByKey(_.o_orderpriority)
      .agg(new TopKAgg(3).toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("g"), col("t.o_orderkey").as("k"), (col("i") + 1).as("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = ds.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(viaAgg == viaWindow)
    // ties broken by key: group A top-3 must be keys 1,2,3 in order
    assert(viaAgg.filter(_._1 == "A").map(t => (t._3, t._2)).toList.sorted ==
      List((1, 1L), (2, 2L), (3, 3L)))
  }

  test("groups smaller than k emit all members") {
    val out = TopK.groupTopKAgg(spark, sfDir)
    val counts = out.groupBy("o_orderpriority").count().collect()
    assert(counts.forall(_.getLong(1) <= 3))
  }

  test("item_cf neighbor lists replay a driver-side cosine^2 ranking") {
    val got = graft.ops.Relational.itemCf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(6)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty)
    val baskets = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("okey"), (col("l_partkey") % 211).as("item"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val cnt = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = baskets.groupBy(_._1).values.flatMap { b =>
      val items = b.map(_._2).sorted
      for (i <- items.indices; j <- i + 1 until items.length) yield (items(i), items(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2L).toMap
    val nbrs = pairs.toSeq.flatMap { case ((i, j), c) => Seq((i, j, c), (j, i, c)) }
    val expected = nbrs.groupBy(_._1).flatMap { case (i, ns) =>
      val scored = ns.map { case (_, j, c) =>
        val cos2 = BigInt(c) * c * 1000000 / (BigInt(cnt(i)) * cnt(j))
        (j, c, cos2.toLong)
      }.sortBy { case (j, c, s) => (-s, -c, j) }
      scored.take(5).zipWithIndex.map { case ((j, c, s), idx) =>
        (i, idx + 1L) -> (j, c, cnt(i), cnt(j), s)
      }
    }
    assert(got == expected)
  }

  test("user_cf replays the popularity-pruned user-pair cosine^2 ranking") {
    val got = graft.ops.Relational.userCf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(6)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baskets = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (orders(r.getLong(0)), r.getLong(1))).distinct
    val icnt = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val kept = baskets.filter(b => icnt(b._2) <= 40L)
    // the cap prunes whenever the popularity head exceeds it — true from
    // sf0.01 up (max 49 users/item there, so the ORACLE GATE exercises
    // the prune); this 6k-row fixture tops out at 39
    if (icnt.values.exists(_ > 40L))
      assert(kept.length < baskets.length, "popularity cap never fired")
    val ucnt = kept.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pairs = kept.groupBy(_._2).values.flatMap { b =>
      val users = b.map(_._1).sorted
      for (i <- users.indices; j <- i + 1 until users.length) yield (users(i), users(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2L).toMap
    val nbrs = pairs.toSeq.flatMap { case ((i, j), c) => Seq((i, j, c), (j, i, c)) }
    val expected = nbrs.groupBy(_._1).flatMap { case (i, ns) =>
      val scored = ns.map { case (_, j, c) =>
        val cos2 = BigInt(c) * c * 1000000 / (BigInt(ucnt(i)) * ucnt(j))
        (j, c, cos2.toLong)
      }.sortBy { case (j, c, s) => (-s, -c, j) }
      scored.take(5).zipWithIndex.map { case ((j, c, s), idx) =>
        (i, idx + 1L) -> (j, c, ucnt(i), ucnt(j), s)
      }
    }
    assert(got == expected)
  }

  test("ndcg_eval: metrics are internally consistent and bounded") {
    val r = graft.ops.Relational.ndcgEval(spark, sfDir).collect().head
    val (nq, nh, hr, nd) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nq > 0 && nh >= 0 && nh <= nq)
    assert(hr == nh * 1000000L / nq, "hit rate must replay from the counts")
    // per-query NDCG is in [0, 1e6] and positive exactly when the query
    // hit, so the floored means obey mean_ndcg <= hit_rate
    assert(nd >= 0L && nd <= 1000000L && nd <= hr)
  }
}
