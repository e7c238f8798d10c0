package graft

import graft.ops.Centroids

/** k-means invariants: the output partitions the corpus, cluster ids
  * stay within the seed id space, runs are deterministic, and one Lloyd
  * step (update + reassign) does not increase inertia vs the seed
  * assignment — checked against a driver-side reference at sf0.001.
  */
class ClusteringSpec extends SparkSpec {

  private def run() = Centroids.kmeansEmbed(spark, sfDir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("kmeans partitions the corpus across the seeded cluster ids") {
    val out   = run()
    val total = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(out.map(_._2).sum == total, "cluster sizes must sum to the corpus")
    assert(out.map(_._1).toSet.subsetOf((0L until Centroids.KmeansK.toLong).toSet))
    assert(out.forall(_._2 > 0))
  }

  test("kmeans is deterministic across runs") {
    assert(run() == run())
  }

  test("one Lloyd step does not increase inertia vs the seed assignment") {
    // driver-side seed-assignment inertia: assign every vector to its
    // nearest seed (same accumulation order as VectorMath) and sum
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val seeds = vecs.filter(_._1 < Centroids.KmeansK).sortBy(_._1)
      .map(_._2.map(_.toDouble))
    def minSqd(v: Array[Float]): Double =
      seeds.map { c =>
        var d = 0.0
        var i = 0
        while (i < v.length && i < c.length) {
          val x = v(i).toDouble - c(i); d += x * x; i += 1
        }
        d
      }.min
    val seedInertia = vecs.map { case (_, v) => minSqd(v) }.sum
    val engInertia  = run().map(_._3).sum.toDouble / 1e6
    // 6dp centroid rounding can perturb the strict Lloyd bound by ~1e-4
    assert(engInertia <= seedInertia + 1e-3,
      s"inertia rose after a Lloyd step: $engInertia > $seedInertia")
  }
}
