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

  test("kmeans_train curve: 5 rounds, non-increasing inertia, round 1 = seed assignment") {
    val curve = Centroids.kmeansTrain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(curve.map(_._1).toSeq == (1L to Centroids.KmeansRounds.toLong))
    // 6dp centroid rounding can perturb the strict Lloyd bound slightly
    curve.sliding(2).foreach {
      case Array((ra, ia), (rb, ib)) =>
        assert(ib <= ia + 1000L, s"inertia rose round $ra -> $rb: $ia -> $ib")
      case _ =>
    }
    // round 1 is the seed assignment — same number the one-step test
    // derives by hand; training must actually improve on it by the end
    assert(curve.last._2 < curve.head._2, "5 rounds improved nothing — vacuous trainer")
  }

  test("pca_power emits a unit direction with positive gain, deterministically") {
    val runs = (1 to 2).map(_ => graft.ops.Centroids.pcaPower(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq)
    assert(runs(0) == runs(1), "power iteration must be bit-deterministic across runs")
    val v = runs(0).map(_._2)
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x * x).sum)
    // float quantization of each component bounds the drift from 1
    assert(math.abs(norm - 1.0) < 1e-5, s"direction must be unit, got $norm")
    assert(runs(0).map(_._3).distinct.size == 1, "eigen is a single scalar")
    assert(runs(0).head._3 > 0.0, "dominant eigenvalue must be positive")
    // power iteration must actually gain over a random direction: the
    // Rayleigh quotient along v exceeds the average row second moment
    val data = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val proj = data.map(x => x.zip(v).map { case (a, b) => a * b }.sum)
    val rayleigh = proj.map(p => p * p).sum
    val avgDir = data.map(x => x.sum / math.sqrt(64.0))
    assert(rayleigh >= avgDir.map(p => p * p).sum,
      "dominant direction must capture at least the uniform direction's energy")
  }

  test("pca_topr: orthogonal components in Rayleigh order, top-1 = pca_power") {
    val rows = graft.ops.Centroids.pcaTopR(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 3 * 64)
    val comps = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (c, rs) => (c, rs.sortBy(_._2).map(_._3), rs.head._4) }
    // each component is unit (float quantization bounds the drift)
    for ((c, v, _) <- comps) {
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"component $c not unit: $n")
    }
    // pairwise orthogonality: deflation projects each update off every
    // prior direction, so residual dot is quantization-level only
    for (Seq((ci, vi, _), (cj, vj, _)) <- comps.combinations(2)) {
      val dot = math.abs(vi.zip(vj).map { case (a, b) => a * b }.sum)
      assert(dot < 1e-3, s"components $ci,$cj not orthogonal: |dot| = $dot")
    }
    // Rayleigh ordering: eigenvalue estimates decrease down the deflation
    val eigs = comps.map(_._3)
    assert(eigs == eigs.sorted.reverse, s"eigen not descending: $eigs")
    assert(eigs.last > 0.0)
    // component 1 must be exactly pca_power's direction (same contract)
    val p1 = graft.ops.Centroids.pcaPower(spark, sfDir)
      .collect().sortBy(_.getLong(0)).map(_.getDouble(1)).toSeq
    assert(comps.head._2.toSeq == p1, "pca_topr comp 1 must reproduce pca_power")
  }

  test("pca_project: whitened scores replay from the served loadings") {
    val proj = graft.ops.Centroids.pcaProject(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val n = proj.keys.map(_._1).toSet.size
    assert(proj.size == 3 * n && n > 0)
    // driver replay from the SERVED loadings/eigenvalues (pca_topr
    // output) against the raw embeddings: score = (x . v) / sqrt(eigen)
    val comps = graft.ops.Centroids.pcaTopR(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(rs => (rs.sortBy(_._2).map(_._3), rs.head._4)).toMap
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    embs.foreach { case (id, x) =>
      for (c <- 1L to 3L) {
        val (v, eig) = comps(c)
        // same fold order as the codegen'd dot: ascending dimension,
        // float operands widened to double
        var dot = 0.0
        var d = 0
        while (d < x.length) { dot += x(d).toDouble * v(d).toFloat.toDouble; d += 1 }
        val want = BigDecimal(dot / math.sqrt(eig))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(proj((id, c)) == want, s"vec $id comp $c")
      }
    }
    // whitening equalizes energy: eigen estimates the XᵀX eigenvalue
    // (≈ n·per-direction second moment), so whitened mean squares land
    // near 1/n for EVERY component — and nearly equal across them,
    // which is the point of dividing by √eigen (raw comp-1 projections
    // would dominate by the eigenvalue ratio instead)
    val ms = (1L to 3L).map(c =>
      embs.indices.map(i => math.pow(proj((embs(i)._1, c)), 2)).sum / n)
    assert(ms.forall(m => m > 0.5 / n && m < 2.0 / n),
      s"whitened mean-square energy not ~1/n (n=$n): $ms")
    assert(ms.max / ms.min < 1.5,
      s"whitening failed to equalize component energies: $ms")
  }

  test("als_rank1 replays the quantized trajectory in BigInt and SSE never increases") {
    import org.apache.spark.sql.functions._
    val cells = graft.tables.Tables.lineitem(spark, sfDir)
      .join(graft.tables.Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey").as("u")), "l_orderkey")
      .groupBy(col("u"), (col("l_partkey") % 211).as("i"))
      .agg(sum(col("l_quantity").cast("long")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var uf = cells.map(_._1).distinct.map(_ -> BigInt(1000000)).toMap
    val T = BigInt(1000000000000L)
    val expect = (1 to 4).map { t =>
      val vf = cells.groupBy(_._2).map { case (i, cs) =>
        i -> (cs.map(c => BigInt(c._3) * uf(c._1)).sum * T) /
          cs.map(c => uf(c._1) * uf(c._1)).sum
      }
      uf = cells.groupBy(_._1).map { case (u, cs) =>
        u -> (cs.map(c => BigInt(c._3) * vf(c._2)).sum * T) /
          cs.map(c => vf(c._2) * vf(c._2)).sum
      }
      val sse = cells.map { case (u, i, r) =>
        val res = BigInt(r) * T - uf(u) * vf(i)
        res * res
      }.sum
      (t.toLong, uf.size.toLong, vf.size.toLong, sse.toString)
    }
    val got = graft.ops.Centroids.alsRank1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expect)
    val sses = got.map(r => BigInt(r._4))
    sses.sliding(2).foreach { case Seq(a, b) => assert(b <= a, s"SSE rose: $a -> $b") }
  }

  test("silhouette_simplified: non-negative by construction, exact arithmetic, partition") {
    val rows = Centroids.silhouetteSimplified(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(rows.map(_._2).sum == total, "cluster sizes must partition the corpus")
    assert(rows.map(_._1).toSet.subsetOf((0L until Centroids.KmeansK.toLong).toSet))
    rows.foreach { case (c, n, sumMicros, mean) =>
      // a point's own centroid is its argmin, so a <= b and s >= 0 — the
      // simplified silhouette can never go negative under this assignment
      assert(sumMicros >= 0L, s"cluster $c: negative silhouette sum")
      assert(sumMicros <= n * 1000000L, s"cluster $c: silhouette above 1")
      // the mean column is exactly the row's own sum/n rounded to 6dp
      val expect = BigDecimal(sumMicros.toDouble / n / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mean == expect, s"cluster $c: mean $mean != $expect")
    }
    // separation exists on this fixture: silhouette is not uniformly zero
    assert(rows.map(_._3).sum > 0L, "all-zero silhouette means degenerate clustering")
    assert(Centroids.silhouetteSimplified(spark, sfDir).collect().toSeq ==
      Centroids.silhouetteSimplified(spark, sfDir).collect().toSeq, "non-deterministic")
  }
}
