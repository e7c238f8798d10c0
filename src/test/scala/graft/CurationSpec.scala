package graft

import graft.functions.SketchFunctions
import graft.ops.Curation
import org.apache.spark.sql.functions._

/** Corpus-curation operators: redaction completeness, chunk coverage,
  * decontamination self-consistency, repetition-metric ranges, sampling
  * determinism, and the Count-Min sketch laws the cms_watchlist verdict
  * leans on.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hrw shard assignment moves only the removed shard's docs") {
    val all     = 0 until Curation.NumShards
    val without = all.filterNot(_ == 3)
    val docs = tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        Curation.hrwShard(col("doc_id"), all).as("before"),
        Curation.hrwShard(col("doc_id"), without).as("after"))
      .cache()
    try {
      // rendezvous property: survivors' hashes are unchanged, so a doc's
      // argmax can only change if the removed shard held it
      assert(docs.filter(col("before") =!= lit(3L) && col("before") =!= col("after"))
        .count() == 0, "docs not on the removed shard must not move")
      val onRemoved = docs.filter(col("before") === lit(3L))
      assert(onRemoved.count() > 0, "fixture must exercise the removed shard")
      assert(onRemoved.filter(col("after") === lit(3L)).count() == 0,
        "removed shard's docs must all re-route")
      // re-routed docs land on valid survivors (which survivor each picks
      // is hash-determined; with few docs on the shard they may collide)
      assert(onRemoved.filter(!col("after").isin(without.map(_.toLong): _*))
        .count() == 0)
    } finally { docs.unpersist(); () }
  }

  test("media_shard_manifest routes with shard_assign's exact HRW assignment") {
    // the manifest must be a VIEW over the same router, not a second
    // hash — per-shard asset counts equal shard_assign's doc counts
    val manifest = graft.ops.Multimodal.mediaShardManifest(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val assign = SparkEntry.queries("shard_assign")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest == assign,
      s"manifest counts $manifest diverge from shard_assign $assign")
    // byte totals are exact payload sums
    val total = graft.ops.Multimodal.mediaShardManifest(spark, sfDir)
      .collect().map(_.getLong(2)).sum
    val expect = tables.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.encode(
            org.apache.spark.sql.functions.col("text"), "utf-8")).cast("long")))
      .collect().head.getLong(0)
    assert(total == expect)
  }

  test("source_cap keeps exactly cap docs per source, matching the window form") {
    val out = Curation.sourceCap(spark, sfDir).cache()
    try {
      // fixture: 20 sources x 25 docs, cap 15 → the cap binds everywhere
      val per = out.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(per.size == 20)
      assert(per.values.forall(_ == Curation.SourceCap.toLong))
      // the bounded-heap threshold must pick the same rows as the
      // window row_number formulation (the oracle's shape)
      val mod = Curation.HashReduceMod
      val ref = tables.Tables.documents(spark, sfDir)
        .select(col("source"), col("doc_id")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
          rows.map { case (s, id) => (s, ((id % mod) * 2654435761L) % mod, id) }
            .sortBy { case (_, h, id) => (h, id) }.take(Curation.SourceCap)
            .map { case (s, _, id) => (s, id) }
        }.toSet
      val got = out.select("source", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == ref)
    } finally { out.unpersist(); () }
  }

  test("MinKKeysAgg is exact under a hot source and adversarial partitioning") {
    import spark.implicits._
    // one source with 20k rows (the hot crawl domain), one with 3 —
    // partitioned every which way the heap thresholds must stay exact
    val rows = (1L to 20000L).map(id => Curation.SrcKey("hot", (id * 37) % 1009, id)) ++
      Seq(Curation.SrcKey("cold", 7L, 99991L), Curation.SrcKey("cold", 7L, 99992L),
        Curation.SrcKey("cold", 2L, 99993L))
    for (parts <- Seq(1, 7, 32)) {
      val thr = rows.toDS().repartition(parts).groupByKey(_.source)
        .agg(new Curation.MinKKeysAgg(15).toColumn.name("t"))
        .collect().toMap
      val expectHot = rows.filter(_.source == "hot")
        .map(r => (r.h, r.doc_id)).sorted.apply(14)
      assert(thr("hot") == expectHot, s"parts=$parts")
      assert(thr("cold") == ((Long.MaxValue, Long.MaxValue)), s"parts=$parts")
    }
  }

  test("MinKKeysAgg under-cap groups keep everything (MaxValue threshold)") {
    import spark.implicits._
    val tiny = Seq(
      Curation.SrcKey("a", 5L, 1L), Curation.SrcKey("a", 3L, 2L),
      Curation.SrcKey("b", 9L, 3L)).toDS()
    val thr = tiny.groupByKey(_.source)
      .agg(new Curation.MinKKeysAgg(15).toColumn.name("t"))
      .collect().toMap
    assert(thr("a") == ((Long.MaxValue, Long.MaxValue)))
    assert(thr("b") == ((Long.MaxValue, Long.MaxValue)))
    // at-cap group: threshold = the cap-th smallest key
    val thr2 = tiny.filter(_.source == "a").groupByKey(_.source)
      .agg(new Curation.MinKKeysAgg(2).toColumn.name("t"))
      .collect().toMap
    assert(thr2("a") == ((5L, 1L)))
  }

  test("pii_redact fires on every row and leaves no residual match") {
    val out = Curation.piiRedact(spark, sfDir).cache()
    try {
      val n = out.count()
      assert(n == 500)
      // every row gained exactly one synthetic email/phone/ip
      assert(out.filter(col("n_emails") >= 1 && col("n_phones") >= 1 && col("n_ips") >= 1)
        .count() == n)
      // the redacted text carries the placeholders and no residual PII
      val residual = out.filter(
        col("redacted").rlike("[A-Za-z0-9._%+-]+@") ||
          col("redacted").rlike("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}") ||
          col("redacted").rlike("\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"))
      assert(residual.count() == 0, "redaction must remove every PII match")
      assert(out.filter(col("redacted").contains("<EMAIL>") &&
        col("redacted").contains("<PHONE>") && col("redacted").contains("<IP>"))
        .count() == n)
    } finally { out.unpersist(); () }
  }

  test("doc_chunks tile each document: stride 90, full coverage, window <= 120") {
    val chunks = Curation.docChunks(spark, sfDir).cache()
    try {
      // offsets are 1, 91, 181, ... (stride 90) and chunk_id counts them
      assert(chunks.filter(col("off") =!= col("chunk_id") * 90 + 1).count() == 0)
      assert(chunks.filter(col("chunk_chars") > 120 || col("chunk_chars") < 1).count() == 0)
      // coverage: the last chunk of every doc reaches the end of the text
      val docs = graft.tables.Tables.documents(spark, sfDir)
        .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      val last = chunks.groupBy("doc_id")
        .agg(max(col("off") + col("chunk_chars") - 1).as("covered"))
      assert(last.join(docs, "doc_id").filter(col("covered") =!= col("len")).count() == 0,
        "chunks must cover the full document")
      // overlap: consecutive chunks share 30 chars (when the next window is full)
      assert(chunks.filter(col("chunk_id") > 0 && col("off") % 90 =!= 1).count() == 0)
    } finally { chunks.unpersist(); () }
  }

  test("sequence_pack: budget respected, every chunk placed once, packing maximally greedy") {
    val packed = Curation.sequencePack(spark, sfDir).cache()
    try {
      // every chunk appears exactly once (same universe as doc_chunks)
      val nChunks = Curation.docChunks(spark, sfDir).count()
      assert(packed.count() == nChunks)
      assert(packed.select("doc_id", "chunk_id").distinct().count() == nChunks)
      // no sequence exceeds the 48-token budget
      val seqs = packed.groupBy("bucket", "seq")
        .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"), max("pos").as("max_pos"))
        .cache()
      assert(seqs.filter(col("fill") > 48).count() == 0, "a sequence exceeds the token budget")
      // pos is dense 0..n-1 within each sequence
      assert(seqs.filter(col("max_pos") =!= col("n") - 1).count() == 0)
      // greedy tightness: sequence s+1 exists only because its first chunk
      // would have overflowed sequence s — no lazy early break
      val firstNext = packed.filter(col("pos") === 0 && col("seq") > 0)
        .select(col("bucket"), (col("seq") - 1).as("seq"), col("n_tokens").as("next_t"))
      val lazyBreaks = seqs.join(firstNext, Seq("bucket", "seq"))
        .filter(col("fill") + col("next_t") <= 48)
      assert(lazyBreaks.count() == 0, "greedy must fill before breaking")
      assert(seqs.count() > nChunks / 4, "packing should form many multi-chunk sequences")
      seqs.unpersist()
    } finally { packed.unpersist(); () }
  }

  test("ngram_decontaminate: benchmark docs self-flag, matches bounded by totals") {
    val out = Curation.ngramDecontaminate(spark, sfDir).cache()
    try {
      assert(out.count() == 500)
      val bench = out.filter(col("is_benchmark"))
      assert(bench.count() == 10)
      // a benchmark doc shares all its n-grams with the benchmark set
      assert(bench.filter(!col("contaminated") || col("n_matched") =!= col("n_ngrams"))
        .count() == 0)
      assert(out.filter(col("n_matched") > col("n_ngrams")).count() == 0)
      // decontamination must not flag everything: most non-benchmark docs are clean
      val nonBench = out.filter(!col("is_benchmark"))
      val clean    = nonBench.filter(!col("contaminated")).count()
      assert(clean * 2 > nonBench.count(), s"only $clean clean docs — n too small?")
    } finally { out.unpersist(); () }
  }

  test("substring_decontaminate: hash flags equal exact-substring truth; bench never flags") {
    val out = Curation.substringDecontaminate(spark, sfDir).cache()
    try {
      assert(out.count() == 500)
      // benchmark docs are the reference set, never flagged against it
      assert(out.filter(col("is_benchmark") && col("contaminated")).count() == 0)
      val flagged = out.filter(col("contaminated"))
        .collect().map(_.getLong(0)).toSet
      assert(flagged.nonEmpty, "fixture must populate contamination")
      // exact-string ground truth, driver-side: a doc is contaminated iff
      // one of its DecontamLen-char windows appears verbatim in a bench
      // doc — pins that the rolling-hash detection has no collision
      // artifacts on the fixture (P = 1e9+7; expected collisions ~1e-4)
      val texts = tables.Tables.documents(spark, sfDir)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      val l = Curation.DecontamLen
      val benchSpans = texts.collect { case (id, t) if id % 50 == 0 =>
        (0 to t.length - l).map(i => t.substring(i, i + l))
      }.flatten.toSet
      val truth = texts.collect {
        case (id, t) if id % 50 != 0 &&
          (0 to t.length - l).exists(i => benchSpans(t.substring(i, i + l))) => id
      }.toSet
      assert(flagged == truth,
        s"hash flags diverge from exact truth: extra=${flagged -- truth} missing=${truth -- flagged}")
    } finally { out.unpersist(); () }
  }

  test("dp_count_release: noise is the hash-CDF value, two-sided, bounded, collision-free") {
    val rows = Curation.dpCountRelease(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, h, sgn, lnT, rel) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(h >= 0 && h < 2147483648L)
      assert(sgn == (if (h >= 1073741824L) 1L else -1L))
      assert(lnT <= 0, "ln of t in (0,1] must be <= 0")
      // |noise| <= ln(2^31) in micros — the CDF's worst case at t_num=1
      assert(math.abs(lnT) <= 21487563L)
      assert(rel == n * 1000000L + sgn * lnT, "release must be count + hash-CDF noise")
    }
    // both noise directions occur, and the group hash is collision-free
    // on the fixture (correlated noise across groups would weaken the
    // mechanism; the stronger 2-char key exists for exactly this)
    assert(rows.exists(_.getLong(4) == 1L) && rows.exists(_.getLong(4) == -1L))
    assert(rows.map(_.getLong(3)).distinct.length == rows.length, "h31 collision")
  }

  test("mcnemar replays from the two collected gates; both disagreement cells populated") {
    val keepRule = Curation.qualityClassifier(spark, sfDir)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val keepLm = Curation.perplexityFilter(spark, sfDir)
      .select("doc_id", "band").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "head")).toMap
    val ids = keepRule.keySet intersect keepLm.keySet
    val b = ids.count(d => keepRule(d) && !keepLm(d)).toLong
    val c = ids.count(d => !keepRule(d) && keepLm(d)).toLong
    val a = ids.count(d => keepRule(d) && keepLm(d)).toLong
    val dd = ids.count(d => !keepRule(d) && !keepLm(d)).toLong
    val row = Curation.mcnemar(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) == ((a, b, c, dd)))
    assert(a + b + c + dd == 500L)
    // the comparator must actually vary — a degenerate gate (all-false)
    // would empty one disagreement cell and trivialize the test
    assert(b > 0L && c > 0L, s"degenerate disagreement cells b=$b c=$c")
    assert(row.getLong(4) == (BigInt(b - c) * (b - c) * 1000000 / (b + c)).toLong)
    assert(row.getLong(5) == (a + dd) * 1000000L / 500L)
  }

  test("repetition_quality metrics stay in range and agree with a hand check") {
    val out = Curation.repetitionQuality(spark, sfDir).cache()
    try {
      assert(out.count() == 500)
      assert(out.filter(col("n_distinct") > col("n_tokens")).count() == 0)
      Seq("dup_token_frac", "top_token_frac", "top_bigram_frac").foreach { c =>
        assert(out.filter(col(c) < 0.0 || col(c) > 1.0).count() == 0, c)
      }
      // hand check one doc against first principles
      val docs = graft.tables.Tables.documents(spark, sfDir)
        .select("doc_id", "text").filter(col("doc_id") === 0).head()
      val w  = docs.getString(1).split(" ").filter(_.nonEmpty).toSeq
      val bg = w.sliding(2).map(_.mkString(" ")).toSeq
      val r  = out.filter(col("doc_id") === 0).head()
      assert(r.getLong(1) == w.size)
      assert(r.getLong(2) == w.distinct.size)
      assert(math.abs(r.getDouble(4) - w.groupBy(identity).values.map(_.size).max.toDouble / w.size) < 1e-12)
      assert(math.abs(r.getDouble(5) - bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size) < 1e-12)
    } finally { out.unpersist(); () }
  }

  test("weighted_sample is deterministic and matches a brute-force rank") {
    val got = Curation.weightedSample(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 50)
    // brute-force the same key on the driver and compare the selection
    val all = graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val u  = ((id * 1103515245L + 12345L) % 1000003L + 1L).toDouble / 1000004.0
        val k  = BigDecimal(math.log(u) / w)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, w, k)
      }
    val want = all.sortBy { case (id, _, k) => (-k, id) }.take(50)
    assert(got.toSeq == want.toSeq)
    // weighting sanity: sampled docs skew long (weight = n_chars)
    val meanSampled = got.map(_._2).sum.toDouble / got.length
    val meanAll     = all.map(_._2).sum.toDouble / all.length
    assert(meanSampled > meanAll, s"weighted sample should favor long docs ($meanSampled vs $meanAll)")
  }

  test("stratified_sample audits every stratum with the configured rate") {
    val rows = Curation.stratifiedSample(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("de", "en", "es", "fr", "zh"))
    rows.foreach { r =>
      val (lang, rate, total, sampled) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rate == (if (lang == "en") 10L else 40L))
      assert(sampled <= total)
      assert(sampled > 0, s"stratum $lang sampled nothing")
      // the sample rate should land near rate_pct (multiplicative-hash bucket)
      assert(math.abs(sampled.toDouble / total - rate / 100.0) < 0.15, s"$lang off-rate")
    }
    // the point of stratification: en is downsampled below the tail languages' rate
    val byLang = rows.map(r => r.getString(0) -> (r.getLong(3).toDouble / r.getLong(2))).toMap
    assert(byLang("en") < byLang.filterKeys(_ != "en").values.min)
  }

  // ---- Count-Min sketch laws (cms_watchlist leans on these) ----

  test("cms never undercounts and is invariant to partitioning and merge shape") {
    val df = (1L to 20000L).map(i => (i * 2654435761L % 400L).toString).toDF("v")
    val targets = (0L until 400L by 37L).map(_.toString)
    def run(parts: Int) = df.repartition(parts)
      .agg(SketchFunctions.cmsFreq(col("v"), targets, 4, 1024).as("cms"))
      .select(explode(col("cms"))).as[(String, Long)].collect().toMap
    val e1 = run(1)
    assert(e1 == run(7) && e1 == run(32), "sketch must not depend on the plan")
    val exact = df.groupBy("v").count().as[(String, Long)].collect().toMap
    targets.foreach { t =>
      assert(e1(t) >= exact.getOrElse(t, 0L), s"CMS undercounted $t")
    }
  }

  test("cms is exact when width dwarfs the distinct domain") {
    val df = (1L to 5000L).map(i => ("k" + (i % 23)).toString).toDF("v")
    val targets = (0 until 23).map("k" + _)
    val est = df.agg(SketchFunctions.cmsFreq(col("v"), targets, 4, 4096).as("cms"))
      .select(explode(col("cms"))).as[(String, Long)].collect().toMap
    val exact = df.groupBy("v").count().as[(String, Long)].collect().toMap
    targets.foreach(t => assert(est(t) == exact(t), s"collision on $t"))
  }

  test("cms excess is bounded by the verdict slack at watchlist scale") {
    // same shape as cms_watchlist: wide domain, narrow watchlist
    val df = (1L to 60000L).map(i => (i % 2000L).toString).toDF("v")
    val targets = (1 to 10).map(_.toString)
    val n = 60000L
    val est = df.agg(SketchFunctions.cmsFreq(col("v"), targets, 4, 4096).as("cms"))
      .select(explode(col("cms"))).as[(String, Long)].collect().toMap
    val exact = df.groupBy("v").count().as[(String, Long)].collect().toMap
    targets.foreach { t =>
      val excess = est(t) - exact(t)
      assert(excess >= 0 && excess <= n * 8 / 4096 + 16, s"$t excess=$excess")
    }
  }

  test("cms ignores nulls") {
    val df  = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("v")
    val est = df.agg(SketchFunctions.cmsFreq(col("v"), Seq("a", "b"), 4, 64).as("cms"))
      .select(explode(col("cms"))).as[(String, Long)].collect().toMap
    assert(est("a") == 2L && est("b") == 1L)
  }

  test("mixture_sample hits the largest-remainder quotas exactly") {
    val rows = Curation.mixtureSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perLang = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // S = 45% of 500 = 225 over weights (de .20, en .35, es .17, fr .15,
    // zh .13): floors 45/78/38/33/29 leave 2 seats; largest fractional
    // parts (en .75, fr .75) take them
    assert(perLang == Map("de" -> 45L, "en" -> 79L, "es" -> 38L, "fr" -> 34L, "zh" -> 29L))
    assert(rows.length == 225)
    // ranks are dense 1..quota within each lang
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("mixture_sample membership is a pure row function (rerun-stable)") {
    val a = Curation.mixtureSample(spark, sfDir).collect().map(_.getLong(0)).toSet
    val b = Curation.mixtureSample(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("train_shuffle is a complete deterministic permutation that genuinely mixes") {
    val rows = Curation.trainShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(n > 0)
    // a PERMUTATION: positions are exactly 1..n, each doc once
    assert(rows.map(_._3).sorted.toSeq == (1L to n.toLong))
    assert(rows.map(_._1).distinct.length == n)
    // the order is exactly (h, doc_id) — the driver replay of the rank
    val want = rows.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, _, _, _), i) => id -> (i + 1).toLong }.toMap
    rows.foreach { case (id, _, pos, batch) =>
      assert(want(id) == pos, s"doc $id pos")
      assert(batch == (pos - 1) / 64, s"doc $id batch")
    }
    // rerun-stable (resumable epochs)
    val again = Curation.trainShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(again.toMap == rows.map(t => (t._1, t._3)).toMap)
    // genuinely mixed: consecutive positions are not consecutive ids —
    // the mean absolute id jump between neighbors in shuffle order is
    // a large fraction of n (a sorted-by-id order would make it 1)
    val byPos = rows.sortBy(_._3).map(_._1)
    val meanJump = byPos.sliding(2).map { case Array(a, b) => math.abs(b - a) }.sum.toDouble / (n - 1)
    assert(meanJump > n / 10.0, s"order barely mixed: mean id jump $meanJump over $n docs")
  }

  test("epoch_mixture balances every language to exactly T with floor/floor+1 repeats") {
    val rows = Curation.epochMixture(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val avail = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val t = avail.values.max
    val byLang = rows.groupBy(_._2)
    assert(byLang.keySet == avail.keySet)
    byLang.foreach { case (lang, rs) =>
      // every language lands on exactly T emitted rows …
      assert(rs.length.toLong == t, s"$lang emitted ${rs.length}, want $t")
      // … with per-doc repeats only floor or floor+1 of T/avail
      val perDoc = rs.groupBy(_._1).values.map(_.length.toLong)
      val base = t / avail(lang)
      assert(perDoc.forall(r => r == base || r == base + 1), s"$lang repeats $perDoc")
      // copies are 1..reps per doc (a complete epoch stream, no gaps)
      rs.groupBy(_._1).foreach { case (id, copies) =>
        assert(copies.map(_._3).sorted.toSeq == (1L to copies.length.toLong), s"doc $id")
      }
    }
    // the dominant language repeats exactly once per doc
    val maxLang = avail.maxBy(_._2)._1
    assert(byLang(maxLang).groupBy(_._1).values.forall(_.length == 1))
  }

  test("largestRemainder apportions the full total within floor/floor+1 of ideal") {
    val cases = Seq(
      (225L, Seq("de" -> 0.20, "en" -> 0.35, "es" -> 0.17, "fr" -> 0.15, "zh" -> 0.13)),
      (7L,   Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)),
      (100L, Seq("x" -> 1.0 / 3, "y" -> 1.0 / 3, "z" -> 1.0 / 3)),
      (1L,   Seq("a" -> 0.4, "b" -> 0.6)))
    cases.foreach { case (total, ws) =>
      val q = Curation.largestRemainder(total, ws).toMap
      assert(q.values.sum == total, s"total=$total ws=$ws -> $q")
      ws.foreach { case (l, w) =>
        val f = math.floor(total * w).toLong
        assert(q(l) == f || q(l) == f + 1, s"$l: ${q(l)} not in [$f, ${f + 1}]")
      }
    }
  }

  test("sampling hashes are overflow-safe past doc_id = 2^32 (no Long wrap)") {
    // the unreduced form doc_id·2654435761 wraps Long in Spark (silent)
    // and raises BIGINT overflow in DuckDB past doc_id ≈ 3.5e9 — the
    // reduced hash must equal the exact BigInt arithmetic at any id
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = Seq(5_000_000_000L, (1L << 33) + 7L, Long.MaxValue / 2, 42L)
    val got = ids.toDF("doc_id")
      .select(col("doc_id"),
        ops.Curation.knuthBucket(col("doc_id"), 100L).as("b100"),
        ops.Curation.knuthBucket(col("doc_id"), 1000003L).as("h"),
        ops.Curation.lcgKey(col("doc_id")).as("u"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    ids.foreach { id =>
      val r = BigInt(id) % 1000003
      val (b100, h, u) = got(id)
      assert(b100 == (r * BigInt(2654435761L) % 100).toLong, s"b100 diverged at $id")
      assert(h == (r * BigInt(2654435761L) % 1000003).toLong, s"h diverged at $id")
      assert(u == ((r * BigInt(1103515245L) + 12345) % 1000003 + 1).toLong, s"u diverged at $id")
    }
  }

  // ---- content-defined chunking ----

  private def chunksOf(text: String): Seq[(Long, Long, Long)] = {
    import org.apache.spark.sql.functions._
    Seq(text).toDF("text")
      .select(explode(graft.functions.TextFunctions.cdcChunksCol(col("text"), 16, 64L)).as("c"))
      .select(col("c.c_start"), col("c.c_len"), col("c.fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  /** deterministic NON-periodic text (an LCG over a 27-letter alphabet):
    * periodic text repeats chunk contents, which collapses fingerprint
    * sets and makes survival ratios meaningless. */
  private def lcgText(n: Int, seed: Long): String = {
    val sb = new StringBuilder(n)
    var s  = seed
    for (_ <- 0 until n) {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      val r = ((s >>> 33) % 27).toInt
      sb.append(if (r == 26) ' ' else ('a' + r).toChar)
    }
    sb.toString
  }

  test("cdc chunks tile the document exactly and short docs are one chunk") {
    val base = lcgText(1200, 42L)
    val cs   = chunksOf(base)
    assert(cs.nonEmpty)
    // contiguous tiling: starts chain and lengths sum to the doc length
    cs.sliding(2).foreach {
      case Seq((s1, l1, _), (s2, _, _)) => assert(s1 + l1 == s2, "gap or overlap between chunks")
      case _                            =>
    }
    assert(cs.map(_._2).sum == base.length.toLong)
    assert(cs.head._1 == 0L && cs.forall(_._2 > 0L), "empty or misaligned chunk")
    // shorter than the 16-cp gram window: exactly one whole-doc chunk
    assert(chunksOf("tiny text") == Seq((0L, 9L, chunksOf("tiny text").head._3)))
    assert(chunksOf("") == Seq.empty)
  }

  test("html_extract: boilerplate dies, entities decode, document text survives intact") {
    val docs = tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(trim(regexp_replace(col("text"), "\\s+", " ")), lit(" & fin")).as("want"))
    val out = Curation.htmlExtract(spark, sfDir)
    // roundtrip: the extracted body is exactly the wrapped document text
    // (whitespace-collapsed) plus the decoded entity tail — nothing of
    // the nav/script/footer/head leaks in, nothing of the doc leaks out
    assert(out.join(docs, "doc_id")
      .filter(col("body_text") =!= col("want")).count() == 0)
    // no tag fragments survive extraction
    assert(out.filter(col("body_text").contains("<") ||
      col("body_text").contains(">")).count() == 0)
    // the removed elements' PAYLOADS are gone too (content removal, not
    // just tag stripping): nav link text, script body, footer, css
    for (leak <- Seq("Home", "About", "track(", "2026", "color:red"))
      assert(out.filter(col("body_text").contains(leak)).count() == 0,
        s"boilerplate payload '$leak' leaked into extracted text")
    // the title channel extracts from the head that body extraction drops
    assert(out.filter(col("title") =!= concat(lit("Doc "),
      col("doc_id").cast("string"))).count() == 0)
  }

  test("k_anonymity: released groups hold ≥ k rows, ladder is exhaustive and minimal") {
    val out = Curation.kAnonymity(spark, sfDir).cache()
    try {
      val nCust = tables.Tables.customer(spark, sfDir).count()
      // exhaustive and exclusive: every customer appears exactly once
      assert(out.count() == nCust)
      assert(out.select("c_custkey").distinct().count() == nCust)
      // the k-anonymity property itself: at levels 0 and 1 every
      // released (quasi_geo, quasi_segment) group has ≥ k members —
      // computed over the RELEASED table, i.e. what an attacker sees
      val small = out.filter(col("level") < 2)
        .groupBy("level", "quasi_geo", "quasi_segment").agg(count(lit(1)).as("n"))
        .filter(col("n") < Curation.KAnon)
      assert(small.count() == 0, "a released group is smaller than k")
      // suppressed rows reveal nothing
      assert(out.filter(col("level") === 2 &&
        (col("quasi_geo") =!= "*" || col("quasi_segment") =!= "*")).count() == 0)
      // minimality: level-1/2 rows exist only because their level-0
      // group was genuinely small (no over-generalization)
      val lvl0Big = tables.Tables.customer(spark, sfDir)
        .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n0"))
        .filter(col("n0") >= Curation.KAnon)
        .join(tables.Tables.nation(spark, sfDir),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("quasi_geo"), col("c_mktsegment").as("quasi_segment"))
      assert(out.filter(col("level") === 0).select("quasi_geo", "quasi_segment")
        .distinct().count() == lvl0Big.distinct().count(),
        "level-0 release set must equal the set of big level-0 groups")
    } finally out.unpersist()
  }

  test("cdc chunking re-synchronizes after a prefix edit (fixed-size chunking cannot)") {
    val base    = lcgText(1200, 42L)
    val edited  = "INSERTED PREFIX >>> " + base
    val baseFps   = chunksOf(base).map(_._3)
    val editedFps = chunksOf(edited).map(_._3)
    // all chunks after the first boundary past the edit keep their
    // fingerprints: the suffix of base's chunk stream reappears intact
    val shared = baseFps.toSet & editedFps.toSet
    assert(baseFps.size >= 4, s"fixture text produced only ${baseFps.size} chunks")
    assert(shared.size >= baseFps.size - 2,
      s"only ${shared.size} of ${baseFps.size} chunk fingerprints survived a prefix edit")
    // and the tail is not merely shared as a set but in stream order
    val tail = baseFps.dropWhile(fp => !editedFps.contains(fp))
    assert(editedFps.containsSlice(tail), "surviving chunks lost their order")
  }

  test("gopher_rules: every rule flips both ways on constructed docs") {
    import spark.implicits._
    // a passing doc: 60 ~4-char alpha words incl. two Gopher stopwords
    val good = (Seq("the", "of") ++ Seq.fill(58)("word")).mkString(" ")
    val docs = Seq(
      (0L, good),                                             // all rules pass
      (1L, (Seq("the", "of") ++ Seq.fill(8)("word")).mkString(" ")),   // word count < 50
      (2L, (Seq("the", "of") ++ Seq.fill(58)("a")).mkString(" ")),     // mean word len < 3
      (3L, (Seq("the", "of") ++ Seq.fill(48)("word") ++ Seq.fill(10)("#")).mkString(" ")), // symbols > 10%
      (4L, (Seq("the", "of") ++ Seq.fill(40)("word") ++ Seq.fill(18)("1234")).mkString(" ")), // alpha < 80%
      (5L, Seq.fill(60)("word").mkString(" ")))               // < 2 distinct stopwords
      .toDF("doc_id", "text")
    val got = Curation.gopherRulesOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
        r.getBoolean(9), r.getBoolean(10), r.getBoolean(11))).toMap
    assert(got(0L) == ((true, true, true, true, true, true)))
    assert(!got(1L)._1 && got(1L)._2 && got(1L)._3 && got(1L)._4 && got(1L)._5)
    assert(got(2L)._1 && !got(2L)._2)
    assert(got(3L)._1 && !got(3L)._3)
    assert(got(4L)._1 && !got(4L)._4)
    assert(got(5L)._1 && got(5L)._2 && got(5L)._3 && got(5L)._4 && !got(5L)._5)
    assert(got.forall { case (id, t) => t._6 == (id == 0L) })
  }

  test("luhn_filter: verdicts match an independent driver-side Luhn reference") {
    val rows = Curation.luhnFilter(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    // textbook right-to-left formulation — independent of the operator's
    // left-indexed fold, so a shared planter/validator bug cannot cancel
    def luhnOk(pan: String): Boolean = {
      val s = pan.map(_ - '0').reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
      }.sum
      s % 10 == 0
    }
    rows.foreach { case (id, pan, valid, expected, matches) =>
      assert(pan.length == 16 && pan.forall(_.isDigit), s"doc $id: $pan")
      assert(luhnOk(pan) == valid, s"doc $id validator vs reference")
      assert(valid == expected && matches, s"doc $id parity")
    }
  }

  test("dsir_weights: src0 docs skew positive, weights replay exactly") {
    val rows = Curation.dsirWeights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_._2).view.mapValues(g => g.map(_._4.toDouble).sum / g.size).toMap
    val others = bySrc.collect { case (s, m) if s != "src0" => m }
    assert(bySrc("src0") > 0.0, s"target slice mean not positive: ${bySrc("src0")}")
    assert(others.forall(_ < bySrc("src0")), "a background source outranks the target slice")
    // exact replay of a handful of docs
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).filter(_.nonEmpty)))
    val all    = docs.flatMap(_._3)
    val cb     = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ct     = docs.filter(_._2 == "src0").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (nb, nt, v) = (cb.values.sum, ct.values.sum, cb.size.toLong)
    def lr(t: String): Long =
      math.round(math.log(((ct.getOrElse(t, 0L) + 1).toDouble * (nb + v)) /
        ((cb(t) + 1).toDouble * (nt + v))) * 1e6)
    val gotW = rows.map(r => r._1 -> (r._3, r._4)).toMap
    docs.take(25).foreach { case (id, _, ts) =>
      val w = ts.groupBy(identity).map { case (t, g) => g.length * lr(t) }.sum
      assert(gotW(id) == ((ts.length.toLong, w)), s"doc $id")
    }
  }

  test("blocklist_filter folds leet obfuscation and replays severity") {
    val rows = graft.ops.Curation.blocklistFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the appended 'sl0w sc4n' MUST be caught on every 7th doc: the
    // normalizer is load-bearing, not decorative
    rows.filter(_.getLong(0) % 7 == 0)
      .foreach(r => assert(r.getLong(1) >= 1L, s"doc ${r.getLong(0)} missed sl0w sc4n"))
    rows.filter(_.getLong(0) % 11 == 0)
      .foreach(r => assert(r.getLong(2) >= 1L, s"doc ${r.getLong(0)} missed b1g t4bl3"))
    // severity = 3·slow_scan + 2·big_table + 1·hash_merge; blocked ⇔ severity>0
    rows.foreach { r =>
      val sev = 3 * r.getLong(1) + 2 * r.getLong(2) + r.getLong(3)
      assert(r.getLong(4) == sev, s"doc ${r.getLong(0)} severity")
      assert(r.getBoolean(5) == (sev > 0), s"doc ${r.getLong(0)} blocked flag")
    }
    // base-text hits exist beyond the synthesized ones (the wordlist is
    // drawn from the fixture vocabulary)
    assert(rows.exists(r => r.getLong(0) % 7 != 0 && r.getLong(0) % 11 != 0
      && r.getLong(4) > 0))
  }

  test("span_corruption: driver replay, T5 round-trip, and overlapping starts merge") {
    import org.apache.spark.sql.functions.col
    val texts = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = graft.ops.Curation.spanCorruption(spark, sfDir).collect()
    assert(rows.length == texts.size)
    var merged = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val toks = texts(id).split(" ").filter(_.nonEmpty)
      val a = ((id % 999983L) * 2654435761L) % 999983L
      val b = ((id % 999983L) * 40503L) % 999983L
      val starts = toks.indices.map { i =>
        val p = i + 1L
        (a * p * p + b * p) % 999983L < 50000L
      }
      val m = toks.indices.map(i =>
        (math.max(0, i - 2) to i).exists(starts))
      val runStart = toks.indices.map(i => m(i) && (i == 0 || !m(i - 1)))
      val ks = runStart.scanLeft(-1L)((acc, rs) => if (rs) acc + 1 else acc).tail
      val inSeq = toks.indices.flatMap { i =>
        if (!m(i)) Some(toks(i))
        else if (runStart(i)) Some(s"<extra_id_${ks(i)}>")
        else None
      }
      val tgtSeq = toks.indices.flatMap { i =>
        if (runStart(i)) Some(s"<extra_id_${ks(i)}> ${toks(i)}")
        else if (m(i)) Some(toks(i))
        else None
      }
      assert(r.getLong(1) == toks.length.toLong && r.getLong(2) == m.count(identity).toLong
        && r.getLong(3) == runStart.count(identity).toLong, s"doc $id counts")
      assert(r.getString(4) == md5Hex(inSeq.mkString(" ")), s"doc $id input digest")
      assert(r.getString(5) == md5Hex(tgtSeq.mkString(" ")), s"doc $id target digest")
      // T5 round-trip: substituting each sentinel in the input with its
      // target span reconstructs the original token stream exactly
      val spans = tgtSeq.mkString(" ").split("<extra_id_\\d+> ").filter(_.nonEmpty)
        .map(_.trim.split(" ").toSeq)
      var si = 0
      val rebuilt = inSeq.flatMap { t =>
        if (t.startsWith("<extra_id_")) { val s = spans(si); si += 1; s }
        else Seq(t)
      }
      assert(rebuilt == toks.toSeq, s"doc $id round-trip")
      // overlap merging: fewer spans than starts means two starts fused
      if (runStart.count(identity) < starts.count(identity)) merged += 1
    }
    assert(merged > 0, "no overlapping spans merged anywhere — rate suspiciously low")
  }

  test("fleiss_kappa replays in BigInt from the three gates' own outputs") {
    import org.apache.spark.sql.functions.col
    val q = graft.ops.Curation.qualityClassifier(spark, sfDir)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> (if (r.getBoolean(1)) 1 else 0)).toMap
    val g = graft.ops.Curation.gopherRules(spark, sfDir)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> (if (r.getBoolean(1)) 1 else 0)).toMap
    val lm = graft.ops.Curation.perplexityFilter(spark, sfDir)
      .select(col("doc_id"), col("band")).collect()
      .map(r => r.getLong(0) -> (if (r.getString(1) == "head") 1 else 0)).toMap
    val rs = q.keySet.intersect(g.keySet).intersect(lm.keySet).toSeq
      .map(id => q(id) + g(id) + lm(id))
    val n = BigInt(rs.size)
    val rr = BigInt(rs.sum)
    val s1 = BigInt(rs.map(r => r * (r - 1) + (3 - r) * (2 - r)).sum)
    val e = rr * rr + (3 * n - rr) * (3 * n - rr)
    val den = 9 * n * n - e
    val num = 3 * n * s1 / 2 - e
    val row = graft.ops.Curation.fleissKappa(spark, sfDir).collect().head
    assert(row.getLong(0) == rs.size.toLong)
    assert(row.getLong(1) == rs.count(_ == 0).toLong && row.getLong(2) == rs.count(_ == 1).toLong)
    assert(row.getLong(3) == rs.count(_ == 2).toLong && row.getLong(4) == rs.count(_ == 3).toLong)
    assert(BigInt(row.getLong(5)) == s1 * 1000000 / (6 * n))
    assert(BigInt(row.getLong(6)) == e * 1000000 / (9 * n * n))
    val expKappa =
      if (den == 0) null
      else java.lang.Long.valueOf((num.signum * (num.abs * 1000000 / den)).toLong)
    assert(row.get(7) == expKappa)
  }
}
