package org.apache.spark.graftbridge

import org.apache.spark.scheduler.StageInfo

/** `StageInfo.shuffleDepId` is `private[spark]`; the run logger needs it
  * to classify a stage as shuffle-map (≈ the reference's ExecMap phase)
  * vs result (≈ ExecReduce). This bridge lives in an `org.apache.spark`
  * subpackage purely to re-export that one accessor.
  */
object SchedulerBridge {
  /** Some(shuffleId) iff the stage writes shuffle output (a map stage). */
  def shuffleDepId(si: StageInfo): Option[Int] = si.shuffleDepId

  /** Block until the listener bus has delivered all queued events —
    * `listenerBus.waitUntilEmpty` is `private[spark]`; specs need it to
    * read listener state deterministically instead of sleeping. */
  def drainListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
