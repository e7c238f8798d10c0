package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Scale-shape assertions with hard numbers: the near-dup pipelines
  * must shuffle O(docs · bands) reduced rows (signatures/bands/ids),
  * never the O(docs²) pair space — measured from real task metrics,
  * not inferred from the plan.
  */
class ScaleSpec extends SparkSpec {

  private class ShuffleCounter extends SparkListener {
    val records = new AtomicLong()
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
    }
  }

  private def shuffleRecordsOf(name: String): Long = {
    val counter = new ShuffleCounter
    spark.sparkContext.addSparkListener(counter)
    try {
      SparkEntry.queries(name)(spark, sfDir).collect()
      org.apache.spark.graftbridge.SchedulerBridge.drainListeners(spark.sparkContext)
      counter.records.get()
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("dedup_minhash shuffles band rows, not the quadratic pair space") {
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count() * 2 // corpus = docs + copies
    val quadratic = nDocs * nDocs / 2
    val records = shuffleRecordsOf("dedup_minhash")
    // bands (32/doc) + candidate ids + verify re-attach + final sort —
    // generous linear envelope, far below the pair space
    assert(records < nDocs * 100,
      s"dedup_minhash shuffled $records records for $nDocs docs — not linear")
    assert(records < quadratic / 2,
      s"dedup_minhash shuffled $records records — quadratic-scale volume")
  }

  test("embedding_neardup shuffles table-bucket rows, not all pairs") {
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count() * 2
    val records = shuffleRecordsOf("embedding_neardup")
    assert(records < nVecs * 100,
      s"embedding_neardup shuffled $records records for $nVecs vectors — not linear")
  }

  test("q1_agg shuffles only group partials, not input rows") {
    val nRows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val records = shuffleRecordsOf("q1_agg")
    // partial aggregation: per-partition partials (groups × partitions),
    // orders of magnitude below the input row count
    assert(records < nRows / 10,
      s"q1_agg shuffled $records of $nRows rows — map-side combine lost")
  }
}
