package graft

import graft.ops.Dedup

/** Recall property of the LSH dedup paths: every constructed near-dup
  * pair (doc, 80%-truncated copy at id+1,000,000) must be found — the
  * banding parameters are chosen so P(miss) is ~1e-5 at the corpus's
  * minimum jaccard, and the DuckDB oracle proves it exactly at sf0.01;
  * this spec pins the property at sf0.001 in-JVM.
  */
class DedupSpec extends SparkSpec {

  test("minhash LSH finds every constructed truncation pair") {
    val found = Dedup.dedupMinhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    // pairs (d, d+1e6) whose truncated copy still has >= 3 tokens and
    // jaccard >= 0.7 are the guaranteed minimum; spot-check a sample of
    // full-length docs (>= 20 tokens → truncation jaccard ~0.8)
    val longDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .filter("n >= 20").collect().map(_.getLong(0)).toSet
    val expected = docIds.filter(longDocs).map(d => (d, d + 1000000L))
    val missing  = expected.filterNot(found)
    assert(missing.isEmpty, s"LSH missed ${missing.length} constructed pairs: ${missing.take(5).mkString(",")}")
  }

  test("embedding near-dup finds every exact copy at cosine 1.0") {
    val found = Dedup.embeddingNearDup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val copyPairs = found.filter { case (a, b, _) => b == a + 1000000L }
    assert(copyPairs.length == nVecs)
    assert(copyPairs.forall(_._3 == 1.0))
  }
}
