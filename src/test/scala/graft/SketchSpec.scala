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

  test("kmv sketch persist + merge equals the direct estimate at ANY cell granularity") {
    // above-k regime (k=64, 5000 distinct) so the estimate path is
    // actually exercised, not the exact small-cardinality shortcut
    val k  = 64
    val df = (1L to 20000L).map(i => (i % 13, i * 2654435761L % 5000L)).toDF("cell", "v")
    val direct = df.agg(SketchFunctions.kmvDistinct(col("v"), k)).head().getLong(0)
    for (cells <- Seq(1, 5, 13)) {
      val sketches = df.withColumn("c2", col("cell") % cells)
        .groupBy("c2")
        .agg(SketchFunctions.kmvSketch(col("v"), k).as("sk"))
        .localCheckpoint() // force the binaries through real serialization
      val merged = sketches.agg(SketchFunctions.kmvMerge(col("sk"), k)).head().getLong(0)
      assert(merged == direct,
        s"persist-then-merge over $cells cells gave $merged, direct gave $direct")
    }
  }

  test("kmv set estimates: exact below k, rho-estimator within bounds above") {
    val k = 256
    def sketchOf(vals: Seq[Long]): Array[Byte] =
      vals.toDF("v").agg(SketchFunctions.kmvSketch(col("v"), k)).head().getAs[Array[Byte]](0)
    // exact regime: union fits in one sketch
    val a = sketchOf(1L to 100L)
    val b = sketchOf(51L to 150L)
    assert(SketchFunctions.kmvSetEstimates(a, b, k) == ((100L, 100L, 150L, 50L)))
    // disjoint sets: intersection exactly zero
    val c = sketchOf(1000L to 1099L)
    assert(SketchFunctions.kmvSetEstimates(a, c, k)._4 == 0L)
    // estimation regime: 10k-element sets with 5k overlap; rho-estimator
    // standard error ~ 1/sqrt(k) = 6.25%, assert a 4-sigma envelope
    val bigA = sketchOf(1L to 10000L)
    val bigB = sketchOf(5001L to 15000L)
    val (ea, eb, eu, ei) = SketchFunctions.kmvSetEstimates(bigA, bigB, k)
    assert(math.abs(ea - 10000L) <= 2500 && math.abs(eb - 10000L) <= 2500)
    assert(math.abs(eu - 15000L) <= 3750, s"union est $eu")
    assert(math.abs(ei - 5000L) <= 2000, s"intersection est $ei")
    // pure function of the byte arrays: replay is identical
    assert(SketchFunctions.kmvSetEstimates(bigA, bigB, k) == ((ea, eb, eu, ei)))
  }

  test("kmv merge tolerates sketches built with mixed fill levels") {
    // one nearly-empty cell + one saturated cell: merge must keep the
    // k unsigned-smallest of the union, same as one pass over the union
    val k = 32
    val a = (1L to 5L).toDF("v").agg(SketchFunctions.kmvSketch(col("v"), k).as("sk"))
    val b = (6L to 5000L).toDF("v").agg(SketchFunctions.kmvSketch(col("v"), k).as("sk"))
    val merged = a.union(b).agg(SketchFunctions.kmvMerge(col("sk"), k)).head().getLong(0)
    val direct = (1L to 5000L).toDF("v")
      .agg(SketchFunctions.kmvDistinct(col("v"), k)).head().getLong(0)
    assert(merged == direct, s"merged=$merged direct=$direct")
  }

  test("kmv ignores nulls like COUNT(DISTINCT)") {
    val df = Seq(Some(1L), Some(2L), None, Some(2L), None).toDF("v")
    val got = df.agg(SketchFunctions.kmvDistinct(col("v"), 64)).head().getLong(0)
    assert(got == 2L)
  }

  // ---- Misra-Gries heavy hitters ----

  /** zipf-ish skewed token stream: item i appears 2^(12-i) times for
    * i in 0..11 plus a uniform tail — heavy head, long tail. */
  private def skewed: Seq[String] =
    (0 until 12).flatMap(i => Seq.fill(1 << (12 - i))(s"head_$i")) ++
      (0 until 2000).map(i => s"tail_$i")

  test("mg is exact and merge-invariant below capacity distinct items") {
    val df = (1L to 5000L).map(i => s"tok_${i % 40}").toDF("v")
    def m(parts: Int): Map[String, Long] = df.repartition(parts)
      .agg(SketchFunctions.mgTopK(col("v"), 64).as("mg"))
      .head().getMap[String, Long](0).toMap
    val exact = df.groupBy("v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m1 = m(1)
    assert(m1 == exact, "below-capacity MG must be the exact count map")
    assert(m1 == m(7) && m1 == m(32), "summary must not depend on the plan")
  }

  test("mg guarantees residency and the N/(cap+1) bound under any partitioning") {
    val data = skewed
    val n    = data.length.toLong
    val cap  = 32
    val err  = n / (cap + 1).toDouble
    val exact = data.groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (parts <- Seq(1, 5, 32)) {
      val mg = data.toDF("v").repartition(parts)
        .agg(SketchFunctions.mgTopK(col("v"), cap).as("mg"))
        .head().getMap[String, Long](0).toMap
      assert(mg.size <= cap, s"parts=$parts: summary exceeded capacity")
      // every counter is a lower bound within N/(cap+1) of the truth
      mg.foreach { case (item, est) =>
        val ex = exact(item)
        assert(est <= ex && ex - est <= err,
          s"parts=$parts item=$item est=$est exact=$ex bound=$err")
      }
      // every item heavier than N/(cap+1) must be resident
      exact.filter(_._2 > err).keys.foreach { item =>
        assert(mg.contains(item), s"parts=$parts heavy item $item evicted")
      }
    }
  }

  test("mg serialize/deserialize round-trips the buffer") {
    val agg = SketchFunctions.MGTopK(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    val buf = new SketchFunctions.MGBuffer(8)
    Seq("a", "a", "b", "c", "c", "c").foreach(buf.insert)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.counts == buf.counts)
  }

  test("mg ignores nulls") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("v")
    val got = df.agg(SketchFunctions.mgTopK(col("v"), 8))
      .head().getMap[String, Long](0).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  // ---- Bloom filter ----

  private val BloomM = 1 << 14
  private val BloomK = 4

  test("bloom bitmap is partition/merge-shape invariant and never false-negative") {
    val keys = (1L to 5000L).map(i => i * 40503L % 100003L)
    val df   = keys.toDF("v")
    def bitmap(parts: Int): Array[Byte] = df.repartition(parts)
      .agg(SketchFunctions.bloomAgg(col("v"), BloomM, BloomK).as("bf"))
      .head().getAs[Array[Byte]](0)
    val b1 = bitmap(1)
    assert(java.util.Arrays.equals(b1, bitmap(7)) && java.util.Arrays.equals(b1, bitmap(32)),
      "bitmap must not depend on the plan")
    // probe every inserted key through the DataFrame path (BloomContains
    // over xxhash64 — the same hash family update used)
    val misses = df
      .crossJoin(broadcast(df.agg(SketchFunctions.bloomAgg(col("v"), BloomM, BloomK).as("bf"))))
      .select(SketchFunctions.bloomContains(col("bf"), xxhash64(col("v")), BloomK).as("hit"))
      .filter(!col("hit")).count()
    assert(misses == 0L, "a member can never probe negative")
  }

  test("bloom false-positive rate on disjoint probes stays near the sizing formula") {
    val keys   = (1L to 5000L).toDF("v")
    val probes = (1000001L to 1010000L).toDF("v")
    val bf     = keys.agg(SketchFunctions.bloomAgg(col("v"), BloomM, BloomK).as("bf"))
    val fp = probes.crossJoin(broadcast(bf))
      .select(SketchFunctions.bloomContains(col("bf"), xxhash64(col("v")), BloomK).as("hit"))
      .filter(col("hit")).count()
    // expected rate (1 - e^(-k n / m))^k ≈ 11.5% at n=5000, m=16384, k=4;
    // allow 2x headroom — the check is "the sketch filters", not a tight CI
    val expected = math.pow(1 - math.exp(-BloomK * 5000.0 / BloomM), BloomK)
    assert(fp <= 2 * expected * 10000, s"fp=$fp expected≈${expected * 10000}")
    assert(fp < 10000, "a useless all-positive filter")
  }

  test("bloom serialize/deserialize round-trips and merge is OR") {
    val agg = SketchFunctions.BloomAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), BloomM, BloomK)
    val a = new SketchFunctions.BloomBuffer(BloomM, BloomK)
    val b = new SketchFunctions.BloomBuffer(BloomM, BloomK)
    a.insert(12345L); b.insert(67890L)
    val back = agg.deserialize(agg.serialize(a))
    assert(java.util.Arrays.equals(back.bits, a.bits))
    val merged = agg.deserialize(agg.serialize(a))
    merged.mergeIn(b)
    assert(graft.functions.BloomMath.contains(merged.bits, 12345L, BloomK) &&
      graft.functions.BloomMath.contains(merged.bits, 67890L, BloomK))
  }

  test("hll_rollup: union-of-parts estimate equals the direct whole-corpus estimate") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_nationkey").as("g"), col("c_custkey").as("k"))
    val direct = cust.agg(hll_sketch_estimate(hll_sketch_agg(col("k"), lit(12))))
      .collect().head.getLong(0)
    val viaUnion = cust.groupBy("g").agg(hll_sketch_agg(col("k"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect().head.getLong(0)
    assert(direct == viaUnion,
      s"HLL union-merge must be lossless vs one-shot build: $viaUnion vs $direct")
    // and the operator's verdict columns hold with real margins
    val rows = graft.ops.Relational.hllRollup(spark, sfDir).collect()
    assert(rows.length > 1 && rows.forall(_.getBoolean(2)))
    val exactGlobal = cust.select("k").distinct().count()
    assert(rows.find(_.getLong(0) == -1L).get.getLong(1) == exactGlobal)
  }
}
