package graft

import graft.ops.TextAnalysis

/** BM25 retrieval checked against a full driver-side reference (Robertson
  * k1=1.2 b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1)) at sf0.001 — ranking,
  * rounding, and tiebreak all pinned.
  */
class RetrievalSpec extends SparkSpec {

  test("unigram_score: Viterbi DP equals exhaustive segmentation; coverage total") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.unigramScore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // log-probs are negative, so every doc score must be strictly < 0
    assert(out.forall(_._3 < 0L), "a doc scored >= 0 under a log-prob model")
    // rebuild the piece table the operator's contract defines, then
    // check a brute-force exhaustive best-segmentation per word equals
    // the doc sums (single chars guarantee full coverage)
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(filter(split(col("text"), " "), t => t =!= "")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val words = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      .filter { case (w, _) => w.length <= 12 }
    val cand = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (k <- 1 to 4; i <- 0 to w.length - k)
        cand.updateWith(w.substring(i, i + k))(v => Some(v.getOrElse(0L) + f))
    }
    val pieces = cand.filter { case (p, c) => p.length == 1 || c >= 5 }
    val total  = pieces.values.sum
    val lq = pieces.map { case (p, c) => p -> math.round(math.log(c.toDouble / total) * 1e6) }
    def exhaustive(w: String): Long =
      if (w.isEmpty) 0L
      else (1 to math.min(4, w.length)).flatMap { k =>
        lq.get(w.substring(0, k)).map(_ + exhaustive(w.substring(k)))
      }.max
    val wordScore = words.keys.map(w => w -> exhaustive(w)).toMap
    val expected = toks.filter(t => wordScore.contains(t._2)).groupBy(_._1).map {
      case (doc, ts) => (doc, ts.length.toLong, ts.map(t => wordScore(t._2)).sum)
    }.toSet
    assert(out.toSet == expected,
      s"DP diverged from exhaustive segmentation (got ${out.length} rows)")
  }

  test("wordpiece_encode: greedy longest-match replay, total coverage, fertility bounds") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.wordpieceEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // fertility bounds: every word yields >= 1 piece (total coverage, no
    // UNK) and n_whole counts a subset of the words
    assert(out.forall { case (_, nw, np, wh) => np >= nw && wh <= nw })
    // rebuild the positional piece vocabulary the contract defines and
    // replay greedy longest-match-first on the driver
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(filter(split(col("text"), " "), t => t =!= "")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val words = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      .filter { case (w, _) => w.length <= 12 }
    val start = scala.collection.mutable.Map.empty[String, Long]
    val cont  = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (k <- 1 to 4; i <- 0 to w.length - k) {
        val m = if (i == 0) start else cont
        m.updateWith(w.substring(i, i + k))(v => Some(v.getOrElse(0L) + f))
      }
    }
    val startV = start.filter { case (p, c) => p.length == 1 || c >= 5 }.keySet
    val contV  = cont.filter { case (p, c) => p.length == 1 || c >= 5 }.keySet
    def greedy(w: String): Long = {
      var pos = 0; var n = 0L
      while (pos < w.length) {
        var k = math.min(4, w.length - pos)
        while (k > 1 && !(if (pos == 0) startV(w.substring(pos, pos + k))
                          else contV(w.substring(pos, pos + k)))) k -= 1
        pos += k; n += 1
      }
      n
    }
    val wp = words.keys.map(w => w -> greedy(w)).toMap
    val expected = toks.filter(t => wp.contains(t._2)).groupBy(_._1).map {
      case (doc, ts) =>
        (doc, ts.length.toLong, ts.map(t => wp(t._2)).sum,
          ts.count(t => wp(t._2) == 1L).toLong)
    }.toSet
    assert(out.toSet == expected, "greedy replay diverged")
  }

  test("stupid_backoff: held-out scoring replays, all three backoff branches fire") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.stupidBackoff(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    // rebuild the split-corpus model on the driver
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).filter(_.nonEmpty)))
    def grams(ts: Array[String], n: Int): Seq[String] =
      if (ts.length < n) Nil else ts.sliding(n).map(_.mkString(" ")).toSeq
    val train = docs.filter(_._1 % 2 == 0)
    val uni = train.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTot = uni.values.sum
    val big = train.flatMap(d => grams(d._2, 2)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tri = train.flatMap(d => grams(d._2, 3)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    var (b1, b2, b3, b0) = (0, 0, 0, 0)
    def score(g: String): Long = {
      val p = g.split(" ")
      if (tri.contains(g) && big.contains(p(0) + " " + p(1))) {
        b1 += 1; BigInt(tri(g)) .toLong * 1000000 / big(p(0) + " " + p(1))
      } else if (big.contains(p(1) + " " + p(2)) && uni.contains(p(1))) {
        b2 += 1; big(p(1) + " " + p(2)) * 400000 / uni(p(1))
      } else if (uni.contains(p(2))) {
        b3 += 1; uni(p(2)) * 160000 / nTot
      } else { b0 += 1; 0L }
    }
    docs.filter(_._1 % 2 == 1).foreach { case (id, ts) =>
      val gs = grams(ts, 3)
      val sum = gs.map(score).sum
      val n = gs.size.toLong
      val avg = if (n > 0) sum / n else 0L
      assert(out(id) == ((n, sum, avg)), s"doc $id")
    }
    info(s"branch counts: tri=$b1 bigram-backoff=$b2 unigram-backoff=$b3 oov=$b0")
    // the held-out split must exercise every branch or the operator is
    // indistinguishable from a plain ratio
    assert(b1 > 0 && b2 > 0 && b3 > 0, s"backoff branches unexercised: $b1/$b2/$b3")
  }

  test("kneser_ney: held-out interpolated-KN scoring replays, all branches fire") {
    val out = TextAnalysis.kneserNey(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).filter(_.nonEmpty)))
    def bigrams(ts: Array[String]): Seq[String] =
      if (ts.length < 2) Nil else ts.sliding(2).map(_.mkString(" ")).toSeq
    val train = docs.filter(_._1 % 2 == 0)
    val big = train.flatMap(d => bigrams(d._2)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ctx  = big.toSeq.groupBy(_._1.split(" ")(0)).view.mapValues(_.map(_._2).sum).toMap
    val nfwd: Map[String, Long] =
      big.keysIterator.toSeq.groupBy(_.split(" ")(0)).view.mapValues(_.size.toLong).toMap
    val nbw: Map[String, Long] =
      big.keysIterator.toSeq.groupBy(_.split(" ")(1)).view.mapValues(_.size.toLong).toMap
    val bT   = big.size.toLong
    var (seen, disc, cont, oov) = (0, 0, 0, 0)
    def score(g: String): Long = {
      val p = g.split(" ")
      if (ctx.contains(p(0))) {
        val t1 =
          if (big.contains(g)) { seen += 1; (BigInt(big(g)) * 4000000 - 3000000) / (4 * ctx(p(0))) }
          else { disc += 1; BigInt(0) }
        val t2 = BigInt(nfwd(p(0))) * BigInt(nbw.getOrElse(p(1), 0L)) * 3000000 /
          (BigInt(ctx(p(0))) * 4 * bT)
        (t1 + t2).toLong
      } else if (nbw.contains(p(1))) { cont += 1; nbw(p(1)) * 1000000L / bT }
      else { oov += 1; 0L }
    }
    docs.filter(_._1 % 2 == 1).foreach { case (id, ts) =>
      val gs  = bigrams(ts)
      val sum = gs.map(score).sum
      val n   = gs.size.toLong
      val avg = if (n > 0) sum / n else 0L
      assert(out(id) == ((n, sum, avg)), s"doc $id")
    }
    info(s"branch counts: seen=$seen discount-only=$disc continuation=$cont oov=$oov")
    assert(seen > 0 && disc > 0, s"KN branches unexercised: $seen/$disc/$cont/$oov")
  }

  test("cohens_kappa replays from lang_id and stays within [-1, 1] micros") {
    val rows = TextAnalysis.cohensKappa(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (nTotal, nAgree) = (r.getLong(0), r.getLong(1))
    val kappa = Option(r.get(4)).map(_.asInstanceOf[Long])
    kappa.foreach(k => assert(k >= -1000000L && k <= 1000000L))
    val pred = TextAnalysis.langId(spark, sfDir).collect()
      .map(x => (x.getString(1), x.getString(2)))
    assert(nTotal == pred.length.toLong)
    assert(nAgree == pred.count { case (a, p) => a == p }.toLong)
    val rowm = pred.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val colm = pred.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val s    = rowm.keySet.intersect(colm.keySet).toSeq
      .map(c => BigInt(rowm(c)) * colm(c)).sum
    val num = BigInt(nAgree) * nTotal - s
    val den = BigInt(nTotal) * nTotal - s
    val expected =
      if (den == 0) None
      else Some((num.sign * ((num.abs * 1000000) / den)).toLong)
    assert(r.getString(2) == num.toString && r.getString(3) == den.toString)
    assert(kappa == expected)
  }

  test("bm25 top-k matches a driver-side reference ranking") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).filter(_.nonEmpty)))
    val terms = TextAnalysis.Bm25Terms
    val k1    = 1.2
    val b     = 0.75
    val n     = docs.length
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val dfm   = terms.map(t => t -> docs.count(_._2.contains(t))).toMap
    def score(tok: Array[String]): Double =
      terms.map { term =>
        val tf = tok.count(_ == term).toDouble
        val df = dfm(term).toDouble
        math.log((n - df + 0.5) / (df + 0.5) + 1.0) *
          (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * tok.length / avgdl))
      }.sum
    val want = docs
      .map { case (id, tok) =>
        (id, tok.length.toLong,
          BigDecimal(score(tok)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, _, s) => (-s, id) }
      .take(10).toSeq
    val got = TextAnalysis.bm25Search(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("bm25 scores are non-negative and the cut is score-then-id ordered") {
    val rows = TextAnalysis.bm25Search(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(rows.forall(_._2 >= 0.0))
    val sorted = rows.sortBy { case (id, s) => (-s, id) }
    assert(rows == sorted)
  }

  test("PostingsAgg keeps the k smallest doc_ids under any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a "stopword" hitting 5000 docs: the bounded buffer must yield the
    // 10 smallest ids whatever the partition layout, never the full list
    val docs = (1L to 5000L).map(i => TextAnalysis.TermDoc("the", 5001L - i))
    for (parts <- Seq(1, 7, 32)) {
      val got = docs.toDS().repartition(parts)
        .groupByKey(_.term)
        .agg(new TextAnalysis.PostingsAgg(10).toColumn.name("p"))
        .collect().head._2
      assert(got == (1L to 10L), s"parts=$parts: $got")
    }
    // under-full term keeps everything, ascending
    val tiny = Seq(TextAnalysis.TermDoc("rare", 9L), TextAnalysis.TermDoc("rare", 3L)).toDS()
    assert(tiny.groupByKey(_.term)
      .agg(new TextAnalysis.PostingsAgg(10).toColumn.name("p"))
      .collect().head._2 == Seq(3L, 9L))
  }

  test("lang_confusion cells replay from lang_id and partition the corpus") {
    import org.apache.spark.sql.functions.col
    val preds = TextAnalysis.langId(spark, sfDir)
      .select("labeled_lang", "predicted_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = preds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val classN = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = TextAnalysis.langConfusion(spark, sfDir).collect()
    assert(got.map(_.getLong(2)).sum == preds.length.toLong, "cells must partition the corpus")
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == expect(k) && r.getLong(3) == classN(k._1))
      assert(r.getLong(4) == BigInt(expect(k)) * 1000000 / classN(k._1))
    }
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(preds.length.toLong == nDocs)
  }

  test("textrank is exactly pagerank over the driver-replayed co-occurrence edges") {
    import graft.ops.Graph
    import org.apache.spark.sql.functions.{col, desc}
    import spark.implicits._
    // the op's only new logic is edge construction: rebuild the distinct
    // symmetric adjacent-pair set driver-side from the raw fixture text
    // and assert the op equals pageRankOn fed those edges
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val pairs = texts.flatMap { t =>
      val w = t.split(" ").filter(_.nonEmpty)
      w.zip(w.drop(1))
    }.distinct
    val edges = (pairs ++ pairs.map(_.swap)).distinct.toSeq.toDF("src", "dst")
    val expect = Graph.pageRankOn(edges)
      .orderBy(desc("rank"), col("node")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = TextAnalysis.textrankKeywords(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
    assert(got.size == 20 && got.map(_._1).distinct.size == 20)
  }

  test("prf_expand replays feedback-mass x idf and excludes query terms") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).filter(_.nonEmpty)))
    val topIds = TextAnalysis.bm25Search(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val n = docs.length
    val dfm = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.length).toMap
    val fbDocs = docs.filter(d => topIds.contains(d._1))
    val cand = fbDocs.flatMap(_._2).distinct
      .filterNot(TextAnalysis.Bm25Terms.contains)
    val want = cand.map { t =>
      val sumTf = fbDocs.map(_._2.count(_ == t).toLong).sum
      val df    = dfm(t).toLong
      val idf   = math.round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
      (t, sumTf, sumTf * idf)
    }.sortBy { case (t, _, w) => (-w, t) }.take(10).toSeq
    val got = TextAnalysis.prfExpand(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5))).toSeq
    assert(got == want.map { case (t, s, w) => (t, s, w) })
    // the original query must never expand into itself
    assert(got.forall(r => !TextAnalysis.Bm25Terms.contains(r._1)))
  }

  test("cooc_pmi replays the windowed pair census and PMI ranking") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).split(" ", -1).filter(_.nonEmpty))
    val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { w =>
      for (i <- w.indices; d <- 1 to 2 if i + d < w.length) {
        val k = (w(i), w(i + d))
        pairCnt(k) = pairCnt.getOrElse(k, 0L) + 1L
      }
    }
    val tp = pairCnt.values.sum
    val cl = pairCnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cr = pairCnt.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val want = pairCnt.toSeq.filter(_._2 >= 5L).map { case ((a, b), c) =>
      val pmi = math.round(
        math.log((c * tp).toDouble / (cl(a) * cr(b)).toDouble) * 1e6)
      (a, b, c, cl(a), cr(b), pmi)
    }.sortBy { case (a, b, _, _, _, pmi) => (-pmi, a, b) }.take(100)
    val got = TextAnalysis.coocPmi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
  }

  test("classifier_prf replays P/R/F1 from lang_id and the macro row averages present F1s") {
    val preds = TextAnalysis.langId(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val labelN = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val predN = preds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val tpN = preds.filter(p => p._1 == p._2).groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val rows = graft.ops.TextAnalysis.classifierPrf(spark, sfDir).collect()
    val (macroRows, classRows) = rows.partition(_.getString(0) == "MACRO")
    assert(macroRows.length == 1)
    var f1s = Vector.empty[Long]
    classRows.foreach { r =>
      val c = r.getString(0)
      val (ln, pn, tp) = (labelN.getOrElse(c, 0L), predN.getOrElse(c, 0L), tpN.getOrElse(c, 0L))
      assert(r.getLong(1) == ln && r.getLong(2) == pn && r.getLong(3) == tp, s"class $c counts")
      assert(Option(r.get(4)).map(_ => r.getLong(4)) ==
        (if (pn > 0) Some(tp * 1000000L / pn) else None), s"class $c precision")
      assert(Option(r.get(5)).map(_ => r.getLong(5)) ==
        (if (ln > 0) Some(tp * 1000000L / ln) else None), s"class $c recall")
      val f1 = if (pn + ln > 0) Some(2 * tp * 1000000L / (pn + ln)) else None
      assert(Option(r.get(6)).map(_ => r.getLong(6)) == f1, s"class $c f1")
      f1.foreach(v => f1s :+= v)
    }
    assert(classRows.map(_.getString(0)).toSet == (labelN.keySet ++ predN.keySet))
    assert(macroRows.head.getLong(6) == f1s.sum / f1s.size)
  }

  test("proximity_search equals the brute-force minimal window over all start/end pairs") {
    import org.apache.spark.sql.functions.col
    val terms = Seq("slow", "scan", "table")
    val texts = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // brute force: every (start, end) token window, keep the smallest
    // containing all three terms
    val want = texts.flatMap { case (id, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      val wins = for {
        s <- toks.indices
        e <- s until toks.length
        w = toks.slice(s, e + 1)
        if terms.forall(w.contains)
      } yield e - s + 1
      if (wins.isEmpty) None else Some((id, wins.min.toLong))
    }.map { case (id, mw) => (id, mw, 1000000L / mw) }
      .sortBy { case (id, _, sc) => (-sc, id) }
      .take(50).toSeq
    val got = TextAnalysis.proximitySearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.head._2 >= 3L, "a 3-term window cannot be shorter than 3")
  }

  test("token_entropy replays the quantized-ln form and orders repetitive below diverse") {
    import org.apache.spark.sql.functions.col
    val texts = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lnM(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val rows = TextAnalysis.tokenEntropy(spark, sfDir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val counts = texts(r.getLong(0)).split(" ").filter(_.nonEmpty)
        .groupBy(identity).map(_._2.length.toLong).toSeq
      val n = counts.sum
      val h = lnM(n) - counts.map(c => c * lnM(c)).sum / n
      assert(r.getLong(1) == n && r.getLong(2) == counts.size.toLong)
      assert(r.getLong(3) == h, s"doc ${r.getLong(0)} entropy")
      assert(h >= 0L)
      val norm = if (counts.size > 1) Some(BigInt(h) * 1000000 / lnM(counts.size)) else None
      assert(Option(r.get(4)).map(_ => BigInt(r.getLong(4))) == norm)
    }
    // semantic pin: a maximally repetitive token stream scores below a
    // maximally diverse one of the same length (what TTR alone blurs)
    val hOf = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    val (rep, div) = (texts.minBy(t => t._2.split(" ").distinct.length),
      texts.maxBy(t => t._2.split(" ").distinct.length))
    assert(hOf(rep._1) <= hOf(div._1))
  }

  test("lsa_topic replays the quantized power iteration in BigInt") {
    import org.apache.spark.sql.functions.col
    val texts = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = texts.size.toLong
    val tf = texts.toSeq.flatMap { case (d, t) =>
      t.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (term, xs) => (d, term, xs.length.toLong) }
    }
    val dfT = tf.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    def lnM(x: Double): Long = math.round(math.log(x) * 1e6)
    val cells = tf.map { case (d, t, f) => (d, t, BigInt(f * lnM(n.toDouble / dfT(t)))) }
    var v = cells.map(_._2).distinct.map(_ -> BigInt(1000000)).toMap
    (1 to 6).foreach { _ =>
      val u0 = cells.groupBy(_._1).view
        .mapValues(cs => cs.map(c => c._3 * v(c._2)).sum / 1000000).toMap
      val um = u0.values.max
      val u = u0.view.mapValues(x => x * 1000000 / um).toMap
      val v0 = cells.groupBy(_._2).view
        .mapValues(cs => cs.map(c => c._3 * u(c._1)).sum / 1000000).toMap
      val vm = v0.values.max
      v = v0.view.mapValues(x => x * 1000000 / vm).toMap
    }
    val want = v.toSeq.sortBy { case (t, l) => (-l, t) }.take(20).zipWithIndex
      .map { case ((t, l), i) => (i + 1L, t, l.toLong) }
    val got = TextAnalysis.lsaTopic(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.head._3 == 1000000L, "max-normalized top loading must be exactly 1e6")
  }
}
