package graft.ops

import org.apache.spark.sql.Dataset

/** Storage hygiene for `localCheckpoint`-per-round iterative operators.
  *
  * `Dataset.unpersist()` only clears CacheManager entries (`cache()` /
  * `persist()`); a checkpoint's storage is RDD-level persistence behind
  * a `LogicalRDD`, invisible to the CacheManager — so "unpersist the
  * superseded round" was silently a no-op for checkpointed tables, and
  * every walk leaked one edge- or node-sized block set per round until
  * driver GC + ContextCleaner got around to it (probe-observed at 32×:
  * a warm `coreness` rerun slowed 25 s → 39 s under the accumulated
  * blocks). [[free]] reaches through to the checkpoint's RDD and drops
  * its blocks directly.
  *
  * Safety contract: a checkpointed RDD has NO lineage — freed blocks
  * cannot be recomputed — so callers must only free a table once every
  * consumer (the next round's checkpoint, eager by default) has
  * materialized.
  */
object Checkpoints {

  /** Frees the storage behind a `localCheckpoint`ed Dataset; no-op for
    * anything that is not a direct checkpoint handle. */
  def free(df: Dataset[_]): Unit = df.queryExecution.logical match {
    case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _                                             => ()
  }

  /** [[free]] guarded for cache-eviction paths (round-21 ADVICE fix):
    * artifact caches hold checkpoint handles whose session may already
    * be stopped — those blocks died with the session and unpersist
    * would throw; live-session handles must free here or every bench
    * eviction strands vocabulary-sized blocks for the session
    * lifetime. */
  def freeIfLive(df: Dataset[_]): Unit =
    if (!df.sparkSession.sparkContext.isStopped) free(df)
}
