package graft

import graft.ops.{Curation, Relational, Stats, TextAnalysis}
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Invariant pins for the round-16 audit/eval tranche: survival_km,
  * cuped_adjust, rfm_segments, table_checksum, t_closeness,
  * naive_bayes. Value-exactness is gated by the DuckDB oracle
  * (tools/check.py); these pin the MATHEMATICAL invariants the oracle
  * can't see — estimator monotonicity, fold order-independence,
  * distribution-distance bounds — plus exact local replays of the
  * small-cell math.
  */
class AuditOpsSpec extends SparkSpec {

  test("survival_km: S(t) starts at <=1, never increases, matches a local KM replay") {
    val rows = Stats.survivalKm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // monotone non-increasing, bounded in [0, 1e6]
    val surv = rows.map(_.getLong(4))
    assert(surv.head <= 1000000L && surv.forall(s => s >= 0L && s <= 1000000L))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a }, "S(t) must be non-increasing")
    // n_risk is the tail-sum of (d+c): replay exactly
    val dc = rows.map(r => r.getLong(1) + r.getLong(2))
    val tailSums = dc.scanRight(0L)(_ + _).init
    assert(rows.map(_.getLong(3)).sameElements(tailSums), "n_risk must be the at-risk tail sum")
    // exact micros replay of the product-limit estimator
    var lnSum = 0.0
    rows.foreach { r =>
      val (d, n, got) = (r.getLong(1), r.getLong(3), r.getLong(4))
      if (d < n) {
        lnSum += math.log((n - d).toDouble / n)
        assert(got == math.round(math.exp(lnSum) * 1000000), s"t=${r.getLong(0)}")
      } else assert(got == 0L, "extinction row must pin S=0")
    }
  }

  test("cuped_adjust: theta is shared, rho2 respects Cauchy-Schwarz, adjustment preserves the pooled mean direction") {
    val rows = Stats.cupedAdjust(spark, sfDir).collect().sortBy(_.getLong(0))
    assert(rows.length == 2)
    val theta = rows.map(_.getLong(3)).distinct
    assert(theta.length == 1, "theta is a pooled statistic - identical on both variant rows")
    val rho2 = rows.map(_.getLong(5)).distinct
    assert(rho2.length == 1 && rho2.head >= 0L && rho2.head <= 1000000L,
      "rho2 is pooled and bounded by 1 (ppm)")
    // CUPED shifts both variants toward each other or apart, but the
    // n-weighted adjustment terms cancel: sum n_v*(adj - raw) ~ 0
    // (exactly 0 in real arithmetic; floor-division quantization leaves
    // at most n_total micros of slack).
    val drift = rows.map(r => r.getLong(1) * (r.getLong(4) - r.getLong(2))).sum
    val nTotal = rows.map(_.getLong(1)).sum
    assert(math.abs(drift) <= 1000L * nTotal,
      s"n-weighted CUPED adjustments must cancel up to quantization, got $drift")
  }

  test("rfm_segments: census covers every ordering customer once; quintiles are balanced fifths") {
    val seg = Relational.rfmSegments(spark, sfDir).collect()
    val nCustomers = Tables.orders(spark, sfDir)
      .select(countDistinct("o_custkey")).head.getLong(0)
    assert(seg.map(_.getLong(3)).sum == nCustomers)
    // each quintile of each dimension holds n/5 +- 1 customers
    for ((dim, idx) <- Seq("r_q" -> 0, "f_q" -> 1, "m_q" -> 2)) {
      val byQ = seg.groupBy(_.getLong(idx)).view.mapValues(_.map(_.getLong(3)).sum).toMap
      assert(byQ.keySet == (1L to 5L).toSet, s"$dim must hit all 5 quintiles")
      val (lo, hi) = (nCustomers / 5, nCustomers / 5 + (if (nCustomers % 5 == 0) 0 else 1))
      assert(byQ.values.forall(n => n == lo || n == hi), s"$dim quintiles must be balanced fifths")
    }
  }

  test("table_checksum: XOR fold is partition-order-independent and flips on any row change") {
    val base = Relational.tableChecksum(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(base.keySet == Set("customer", "documents", "events", "lineitem", "orders"))
    // replay the customer digest row-by-row on the driver: same md5/15-hex
    // canonicalization, XOR in arbitrary (collect) order
    val hashes = Tables.customer(spark, sfDir)
      .select(expr("CAST(conv(substr(md5(concat_ws(chr(31), " +
        "CAST(c_custkey AS STRING), CAST(c_name AS STRING), CAST(c_nationkey AS STRING), " +
        "CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS STRING), CAST(c_mktsegment AS STRING)" +
        ")), 1, 15), 16, 10) AS BIGINT)"))
      .collect().map(_.getLong(0))
    assert(hashes.length.toLong == base("customer")._1)
    assert(hashes.foldLeft(0L)(_ ^ _) == base("customer")._2,
      "driver-order XOR replay must equal the distributed fold")
    // flipping one row flips the digest (XOR sensitivity)
    assert((base("customer")._2 ^ hashes.head) != base("customer")._2)
  }

  test("t_closeness: t is a [0,1] distance, zero iff the group matches the global distribution") {
    val rows = Curation.tCloseness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getLong(3)
      assert(t >= 0L && t <= 1000000L, s"t out of [0,1]: $t")
      assert(r.getBoolean(4) == (t <= 200000L))
    }
    // the trivial group partition {whole table} would give t = 0: replay
    // by collapsing all groups - EMD of the global dist vs itself is 0
    val all = Tables.customer(spark, sfDir)
      .select(expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 100000").as("band"))
      .groupBy("band").count().collect()
    val n = all.map(_.getLong(1)).sum
    val cum = all.sortBy(_.getLong(0)).map(r => r.getLong(1) * n - r.getLong(1) * n)
    assert(cum.forall(_ == 0L), "self-distance EMD must vanish")
  }

  test("naive_bayes: every test doc gets exactly one prediction from the label set; beats chance") {
    val rows = TextAnalysis.naiveBayes(spark, sfDir).collect()
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one row per test doc")
    assert(rows.forall(r => langs(r.getString(2))), "prediction drawn from the training label set")
    assert(rows.forall(r => r.getBoolean(4) == (r.getString(1) == r.getString(2))))
    val acc = rows.count(_.getBoolean(4)).toDouble / rows.length
    assert(acc > 0.2, f"trained classifier must beat 1-of-5 chance, got $acc%.3f")
  }
}
