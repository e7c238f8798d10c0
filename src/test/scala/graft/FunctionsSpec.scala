package graft

import graft.functions.{TextFunctions, VectorFunctions, VectorMath}
import org.apache.spark.sql.functions._

/** Correctness of the custom Catalyst expressions against independent
  * references: the codegen'd cosine vs the pure-builtin composition and
  * a driver-side computation; simhash/minhash sanity; text utilities.
  */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("codegen cosine == builtin-composition cosine == driver-side") {
    val two = emb.limit(2).collect().map(_.getSeq[Float](1).toArray)
    val a   = two(0)
    val b   = two(1)
    def cosRef(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val na  = math.sqrt(x.map(v => v.toDouble * v.toDouble).sum)
      val nb  = math.sqrt(y.map(v => v.toDouble * v.toDouble).sum)
      dot / (na * nb)
    }
    val pairs = emb.as("l").limit(50)
      .crossJoin(emb.as("r").limit(50))
      .select(
        VectorFunctions.cosine(col("l.embedding"), col("r.embedding")).as("fast"),
        VectorFunctions.cosineBuiltin(col("l.embedding"), col("r.embedding")).as("ref"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"codegen ${r.getDouble(0)} vs builtin ${r.getDouble(1)}")
    }
    assert(math.abs(cosRef(a, a) - 1.0) < 1e-12)
  }

  test("dot product expression matches driver-side computation") {
    val rows = emb.limit(10).select(col("vec_id"),
      VectorFunctions.dot(col("embedding"), col("embedding")).as("d"),
      col("embedding")).collect()
    rows.foreach { r =>
      val v        = r.getSeq[Float](2)
      val expected = v.map(x => x.toDouble * x.toDouble).sum
      assert(math.abs(r.getDouble(1) - expected) < 1e-9)
    }
  }

  test("simhash: identical docs collide, near-dups are close, it is deterministic") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "completely different words appear in this unrelated sentence here")
    ).toDF("id", "text")
    val hashed = docs
      .select(col("id"), TextFunctions.simhash(split(col("text"), " ")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(1L) == hashed(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashed(1L), hashed(3L)) < ham(hashed(1L), hashed(4L)))
  }

  test("minhash signature: identical inputs identical sigs; jaccard-ish similarity") {
    val docs = Seq(
      (1L, Seq("a b", "b c", "c d", "d e")),
      (2L, Seq("a b", "b c", "c d", "d e")),
      (3L, Seq("a b", "b c", "c d", "x y")),
      (4L, Seq("p q", "q r", "r s", "s t"))
    ).toDF("id", "sh")
    val sigs = docs
      .select(col("id"), TextFunctions.minhashSig(col("sh"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(1L), sigs(3L)) > agree(sigs(1L), sigs(4L)))
    assert(sigs.values.forall(_.size == 64))
  }

  test("fused minhash kernels equal the shingle-then-sign composition") {
    // includes multi-byte code points, repeated grams (the multiset=set
    // property), consecutive/trailing spaces (empty-token split edges),
    // and below-window-length inputs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaaaaaa"),
      (3L, "naïve café naïve café déjà vu déjà vu"),
      (4L, "double  space  and trailing "),
      (5L, "ab"),
      (6L, "日本語のテキストです 日本語のテキストです and some ascii")
    ).toDF("id", "text")
    val k = 32
    for (n <- Seq(3, 5)) {
      val rows = docs.select(
        TextFunctions.minhashCharGramsCol(col("text"), n, k).as("fused_c"),
        TextFunctions.minhashSig(TextFunctions.charShinglesDistinct(col("text"), n), k).as("comp_c"),
        TextFunctions.minhashWordGramsCol(col("text"), n, k).as("fused_w"),
        TextFunctions.minhashSig(TextFunctions.wordShinglesDistinct(col("text"), n), k).as("comp_w")
      ).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"char $n-grams diverge")
        assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"word $n-grams diverge")
      }
    }
  }

  test("wordShingles/charShingles handle short inputs") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("id", "text")
    val out = df.select(col("id"),
      TextFunctions.wordShingles(split(col("text"), " "), 3).as("ws"),
      TextFunctions.charShingles(col("text"), 5).as("cs")).collect()
    val short = out.find(_.getLong(0) == 1L).get
    assert(short.getSeq[String](1).isEmpty)   // 2 tokens < 3 → empty
    val longer = out.find(_.getLong(0) == 2L).get
    assert(longer.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(longer.getSeq[String](2).head == "a b c")
  }

  test("fingerprint matches driver-side rolling hash") {
    val df  = Seq((1L, "hello world")).toDF("id", "text")
    val got = df.select(TextFunctions.fingerprint(col("text"))).head().getLong(0)
    val expected = "hello world".foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    assert(got == expected)
  }

  test("VectorMath handles zero vectors without NaN") {
    val z = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0f, 0f))
    assert(VectorMath.cosineF(z, z) == 0.0)
  }

  test("gramHashes sliding window == per-gram rolling-hash folds (incl. non-BMP)") {
    import org.apache.spark.unsafe.types.UTF8String
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aßç∂🙂xyz🙂ß∂", // surrogate pairs: grams index CODE POINTS
      "aaaaaaaaaa", "short", "", "exact")
    for (s <- samples; l <- Seq(1, 3, 5)) {
      val cps = s.codePoints().toArray
      val want =
        if (cps.length < l) Seq.empty[Long]
        else (0 to cps.length - l).map { i =>
          graft.functions.ShingleMath.rollingHash(
            UTF8String.fromString(new String(cps, i, l)))
        }
      // driver (interpreted) path
      val interp = graft.functions.ShingleMath
        .gramHashes(UTF8String.fromString(s), l).toLongArray().toSeq
      assert(interp == want, s"interp mismatch for '$s' l=$l")
      // codegen path through a real plan
      val viaDf = Seq(Tuple1(s)).toDF("t")
        .select(TextFunctions.gramHashesCol(col("t"), l)).head().getSeq[Long](0)
      assert(viaDf == want, s"codegen mismatch for '$s' l=$l")
    }
  }

  test("sqDist expression equals the nearestCentroid candidate term") {
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1f, 2f, 3f))
    val c = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.5, 2.0, 4.5))
    val d = VectorMath.sqDistFD(a, c)
    assert(d == 0.5 * 0.5 + 0.0 + 1.5 * 1.5)
  }

  test("md5Lower64 equals the oracle's md5_number_lower (last 8 md5 bytes, LE)") {
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592; last 8 bytes
    // little-endian = 0x92c51710919d71b9 (verified against DuckDB 1.0)
    val h = graft.functions.TextMath.md5Lower64(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello"))
    assert(h == 0x92c51710919d71b9L)
  }

  test("simhashMd5: identical docs collide, near-dups closer than unrelated") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "completely different words appear in this unrelated sentence here")
    ).toDF("id", "text")
    val hashed = docs
      .select(col("id"), TextFunctions.simhashMd5(split(col("text"), " ")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(1L) == hashed(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashed(1L), hashed(3L)) < ham(hashed(1L), hashed(4L)))
  }

  test("nearestCentroid: picks min distance, FIRST centroid wins exact ties") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def cents(cs: Array[Double]*): ArrayData =
      ArrayData.toArrayData(cs.map(c => ArrayData.toArrayData(c)).toArray)
    val emb = ArrayData.toArrayData(Array(1f, 0f))
    assert(VectorMath.nearestCentroid(emb,
      cents(Array(5.0, 5.0), Array(1.0, 0.0), Array(0.0, 0.0))) == 1)
    // equidistant (+1,0) vs (-1,0) from origin-ish point: first wins
    val origin = ArrayData.toArrayData(Array(0f, 0f))
    assert(VectorMath.nearestCentroid(origin,
      cents(Array(1.0, 0.0), Array(-1.0, 0.0))) == 0)
  }

  test("TopNeighborsAgg output equals the row_number-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val n = 200
    val pairs = (0 until n).map { i =>
      // deliberate sim ties (i % 7) to exercise the id tie-break
      (i % 4L, i.toLong + 100, (i % 7).toDouble)
    }.toDF("query_id", "neighbor_id", "sim")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    val windowed = pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= ops.Similarity.K)
      .select("query_id", "neighbor_id", "rank", "sim")
      .orderBy("query_id", "rank")
      .collect().toSeq
    val agged = {
      import spark.implicits._
      pairs.as[ops.Similarity.SimPair]
        .groupByKey(_.query_id)
        .agg(new ops.Similarity.TopNeighborsAgg(ops.Similarity.K).toColumn.name("top"))
        .toDF("query_id", "top")
        .select(col("query_id"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("query_id"), col("t.neighbor_id"),
          (col("i") + 1).cast("long").as("rank"), col("t.sim"))
        .orderBy("query_id", "rank")
        .collect().toSeq
    }
    assert(agged == windowed)
  }

  test("symbolPairs parses wrapped BPE symbol strings into adjacent pairs") {
    val rows = Seq("<h><e><l><l><o>", "<ab><c>", "<x>", "")
      .toDF("s")
      .select(TextFunctions.symbolPairsCol(col("s")).as("p"))
      .collect()
      .map(_.getSeq[String](0))
    assert(rows(0) == Seq("h e", "e l", "l l", "l o"))
    assert(rows(1) == Seq("ab c"))
    assert(rows(2) == Seq.empty)
    assert(rows(3) == Seq.empty)
  }

  test("BPE merge via wrapped replace is boundary-safe and greedy left-to-right") {
    // consecutive non-overlapping occurrences all merge (canonical BPE),
    // and a pair never matches inside or across multi-char symbols
    val df = Seq(
      ("<a><b><a><b>", "<a><b>", "<ab>"),   // consecutive pairs
      ("<l><l><l>", "<l><l>", "<ll>"),      // overlap: greedy left-to-right
      ("<a><bc><d>", "<a><b>", "<ab>"))     // no match inside symbol "bc"
      .toDF("s", "pat", "rep")
      .select(replace(col("s"), col("pat"), col("rep")).as("m"))
      .collect().map(_.getString(0))
    assert(df(0) == "<ab><ab>")
    assert(df(1) == "<ll><l>")
    assert(df(2) == "<a><bc><d>")
  }

  test("pHash63 replays an independent BigInt DCT and is perceptually stable") {
    import graft.functions.MediaMath
    // independent replay: region means -> 2-D DCT over the shared
    // integer cosine table -> AC sign bits, all in BigInt
    def replay(payload: Array[Byte], stride: Int): Long = {
      val n = payload.length
      if (n == 0) return 0L
      val sums = new Array[Long](64); val lens = new Array[Long](64)
      for (i <- 0 until n) {
        val b = if (stride > 0 && i % stride == 0) 88L else (payload(i) & 0xFF).toLong
        val r = (i.toLong * 64 / n).toInt
        sums(r) += b; lens(r) += 1
      }
      val mean = (0 until 64).map(r => if (lens(r) == 0) BigInt(0)
        else BigInt(sums(r)) * 1000000 / lens(r))
      var sig = 0L
      for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0) {
        val coeff = (0 until 64).map(r =>
          BigInt(MediaMath.CosQ(u)(r / 8)) * MediaMath.CosQ(v)(r % 8) * mean(r)).sum
        if (coeff > 0) sig |= 1L << (u * 8 + v - 1)
      }
      sig
    }
    val samples = Seq("key agg row scan slow fast table value part hash",
      "batch window spark order data column agg join small line",
      "x", "").map(_.getBytes("UTF-8"))
    samples.foreach { p =>
      assert(MediaMath.pHash63(p, 0) == replay(p, 0))
      assert(MediaMath.pHash63(p, 97) == replay(p, 97))
    }
    assert(MediaMath.pHash63(Array.empty[Byte], 0) == 0L)
    // the perceptual property: a stride-97 re-encode moves FEW bits;
    // unrelated payloads differ in many
    val a  = samples(0); val b = samples(1)
    val ha = MediaMath.pHash63(a, 0); val hav = MediaMath.pHash63(a, 97)
    val hb = MediaMath.pHash63(b, 0)
    assert(java.lang.Long.bitCount(ha ^ hav) <= 12,
      s"re-encode moved ${java.lang.Long.bitCount(ha ^ hav)} bits")
    assert(java.lang.Long.bitCount(ha ^ hb) > 12,
      "unrelated assets must sit far apart")
  }
}
