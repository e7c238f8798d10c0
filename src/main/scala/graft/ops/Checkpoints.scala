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

  /** `localCheckpoint` that genuinely RETAINS `hashpartitioning(partKeys)`
    * and the `sortKeys` ordering in the resulting `LogicalRDD`, so every
    * downstream equi-join on `partKeys` plans exchange- AND sort-free on
    * this arm (PlanSpec pins the mechanism executably).
    *
    * Why the AQE-off scope: under AQE (on by default) `localCheckpoint`
    * captures `UnknownPartitioning` and no ordering —
    * `LogicalRDD.fromDataset` cannot see through `AdaptiveSparkPlanExec`
    * to the final plan's partitioning — so the round-21 inline
    * repartition+sort+checkpoint sites paid their shuffle+sort with ZERO
    * downstream benefit (round-22 probe: the per-round joins still
    * re-exchanged and re-sorted both arms). With AQE disabled for just
    * this one materialization the capture works, and consumers planned
    * with AQE back on honor the leaf partitioning.
    *
    * The partition count comes from `spark.sql.shuffle.partitions`
    * (conf-driven — core count in Bench, cluster-sized in production),
    * so the layout stays scale-adaptive; the single checkpoint job
    * foregoes AQE coalescing, acceptable for the edge-/matrix-sized
    * tables this guards. NOT thread-safe (session-global conf flip):
    * call only on a query's serial spine, never inside thread-pool
    * fan-outs. */
  def partitionedCheckpoint(df: org.apache.spark.sql.DataFrame,
                            partKeys: Seq[String],
                            sortKeys: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val sk = if (sortKeys.isEmpty) partKeys else sortKeys
    capturedCheckpoint(
      df.repartition(partKeys.map(col): _*).sortWithinPartitions(sk.map(col): _*),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** [[partitionedCheckpoint]] minus the repartition+sort: checkpoints
    * `df` in the same brief AQE-off scope so whatever partitioning and
    * ordering df's plan ALREADY produces (e.g. an explicit
    * repartition(n, key) + key-partitioned window) is captured in the
    * LogicalRDD instead of degraded to UnknownPartitioning. Same
    * thread-safety caveat. */
  def capturedCheckpoint(df: org.apache.spark.sql.DataFrame,
                         level: org.apache.spark.storage.StorageLevel)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val k = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(k, "true")
    spark.conf.set(k, "false")
    try df.localCheckpoint(true, level)
    finally spark.conf.set(k, prev)
  }

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
