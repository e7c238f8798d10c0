package graft

import graft.ops.TextAnalysis

/** BM25 retrieval checked against a full driver-side reference (Robertson
  * k1=1.2 b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1)) at sf0.001 — ranking,
  * rounding, and tiebreak all pinned.
  */
class RetrievalSpec extends SparkSpec {

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
}
